"""ZK proof-system fields: BN254 and BLS12-381 base/scalar fields.

Twin of the reference's `Field256`/`Field384`
(cpp/include/zk_field_arithmetic.h:229-300, cpp/src/zk_field_arithmetic.cpp):
Montgomery-form arithmetic on 8/12 uint32 limb lanes (ops/limbs.py), fully
batched — a "field element" array carries arbitrary leading axes, so curve
and MSM code vectorizes across thousands of points per TPU program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import limbs as lb

__all__ = ["Field", "BN254_FQ", "BN254_FR", "BLS12_381_FQ", "BLS12_381_FR",
           "bn254_fq", "bn254_fr", "bls12_381_fq", "bls12_381_fr"]

# Curve moduli (standard constants; the reference hardcodes the same values
# in zk_field_arithmetic.cpp)
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BLS12_381_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001


class Field:
    """Fixed prime field on uint32 limb lanes, Montgomery domain."""

    def __init__(self, q: int, n_limbs: int):
        self.q = q
        self.n_limbs = n_limbs
        c = lb.mont_constants(q, n_limbs)
        self.q_inv32 = c["q_inv32"]
        self.r_mod_q = c["r_mod_q"]
        self.r2_mod_q = c["r2_mod_q"]
        self.q_limbs = lb.limbs_from_int(q, n_limbs)
        self.r2_limbs = lb.limbs_from_int(self.r2_mod_q, n_limbs)
        self.one_mont = lb.limbs_from_int(self.r_mod_q, n_limbs)  # 1 in Mont
        self.zero = lb.limbs_from_int(0, n_limbs)

    # -- host conversions (to/from Montgomery form) --------------------------
    def to_mont_host(self, x: int):
        return lb.limbs_from_int(x * self.r_mod_q % self.q, self.n_limbs)

    def from_mont_int(self, arr) -> int:
        return lb.limbs_to_int(self.from_mont(arr))

    def encode(self, values):
        """Array of ints -> Montgomery-form limb array."""
        vals = np.asarray(values, dtype=object)
        scaled = (vals * self.r_mod_q) % self.q
        return lb.limbs_from_ints(scaled, self.n_limbs)

    def decode(self, arr) -> np.ndarray:
        """Montgomery-form limb array -> object array of ints."""
        return lb.limbs_to_ints(self.from_mont(arr))

    # -- arithmetic (arrays in Montgomery form) ------------------------------
    def add(self, a, b):
        return lb.add_mod(a, b, self.q_limbs)

    def sub(self, a, b):
        return lb.sub_mod(a, b, self.q_limbs)

    def neg(self, a):
        return lb.neg_mod(a, self.q_limbs)

    def mul(self, a, b):
        return lb.mont_mul(a, b, self.q_limbs, self.q_inv32)

    def square(self, a):
        return self.mul(a, a)

    def from_mont(self, a):
        """a * R^{-1}: multiply by 1 (non-Montgomery)."""
        one = jnp.broadcast_to(
            lb.limbs_from_int(1, self.n_limbs), a.shape)
        return lb.mont_mul(a, one, self.q_limbs, self.q_inv32)

    def to_mont(self, a):
        """Raw residue array -> Montgomery form."""
        r2 = jnp.broadcast_to(self.r2_limbs, a.shape)
        return lb.mont_mul(a, r2, self.q_limbs, self.q_inv32)

    def inv(self, a):
        """a^{-1} via Fermat: a^(q-2), square-and-multiply over the fixed
        exponent bits (static unroll, fully batched)."""
        return self.pow_const(a, self.q - 2)

    def pow_const(self, a, e: int):
        """a^e for a static integer exponent.

        Square-and-multiply as a `fori_loop` over the exponent's bits (kept
        in a constant array) so the compiled graph contains ONE mul+square
        body instead of ~2*bits unrolled Montgomery products — the unrolled
        form produces half-million-op graphs at 256-bit sizes.
        """
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)],
                           dtype=jnp.uint32)

        def body(i, carry):
            result, base = carry
            hit = self.mul(result, base)
            result = jnp.where((bits[i] == 1)[..., None], hit, result)
            base = self.square(base)
            return (result, base)

        result = jnp.broadcast_to(self.one_mont, a.shape)
        result, _ = jax.lax.fori_loop(0, nbits, body, (result, a))
        return result

    def is_zero(self, a):
        return lb.is_zero(a)

    def eq(self, a, b):
        return lb.is_zero(self.sub(a, b))

    def select(self, pred, a, b):
        return lb.select(pred, a, b)

    def sqrt(self, a):
        """Square root for q == 3 mod 4: a^((q+1)/4); caller checks validity."""
        if self.q % 4 != 3:
            raise NotImplementedError("sqrt only for q = 3 mod 4")
        return self.pow_const(a, (self.q + 1) // 4)


def bn254_fq() -> Field:
    return Field(BN254_FQ, 8)


def bn254_fr() -> Field:
    return Field(BN254_FR, 8)


def bls12_381_fq() -> Field:
    return Field(BLS12_381_FQ, 12)


def bls12_381_fr() -> Field:
    return Field(BLS12_381_FR, 8)
