"""ZK proof-system fields: BN254 and BLS12-381 base/scalar fields.

Twin of the reference's `Field256`/`Field384`
(cpp/include/zk_field_arithmetic.h:229-300, cpp/src/zk_field_arithmetic.cpp),
built on the MXU digit engine (ops/digits.py): elements are strict 8-bit
digit arrays in Montgomery form, multiplication is two constant matmuls +
log-depth carry resolution, and everything batches over leading axes — the
design target is thousands of field ops per fused TPU program (MSM, IPA,
Poseidon all ride this).

All stored elements are canonical ([0, q), strict digits), so equality and
zero tests are plain digit comparisons.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import digits as dg

__all__ = ["Field", "BN254_FQ", "BN254_FR", "BLS12_381_FQ", "BLS12_381_FR",
           "bn254_fq", "bn254_fr", "bls12_381_fq", "bls12_381_fr"]

# Standard curve moduli (the reference hardcodes the same values in
# zk_field_arithmetic.cpp)
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BLS12_381_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001


class Field:
    """Fixed odd prime field on 8-bit digit lanes, Montgomery domain."""

    def __init__(self, q: int, n_digits: int):
        if q % 2 == 0 or (q >> (8 * n_digits)) or 2 * q >= 1 << (8 * n_digits):
            raise ValueError("need odd q with 2q < 2^(8*n_digits)")
        self.q = q
        self.n_limbs = n_digits          # trailing-axis width (digit count)
        R = 1 << (8 * n_digits)
        self.r_mod_q = R % q
        self.r2_mod_q = R * R % q
        self.r_inv_mod_q = pow(self.r_mod_q, -1, q)
        # host digit arrays FIRST (never np.asarray a device array here: a
        # single device->host fetch flips the axon tunnel into a ~4ms/
        # dispatch synchronous mode for the rest of the process)
        qp = (-pow(q, -1, R)) % R
        self._q_digits_np = np.array(
            [(q >> (8 * i)) & 0xFF for i in range(n_digits)], np.int32)
        self._np_digits_np = np.array(
            [(qp >> (8 * i)) & 0xFF for i in range(n_digits)], np.int32)
        self.q_digits = jnp.asarray(self._q_digits_np)
        self.np_digits = jnp.asarray(self._np_digits_np)
        self.one_mont = dg.digits_from_int(self.r_mod_q, n_digits)
        self.zero = dg.digits_from_int(0, n_digits)

    # -- host conversions ----------------------------------------------------
    def encode(self, values):
        """Ints -> Montgomery-form digit array."""
        vals = np.asarray(values, dtype=object)
        scaled = (vals % self.q) * self.r_mod_q % self.q
        return dg.digits_from_ints(scaled, self.n_limbs)

    def decode(self, arr) -> np.ndarray:
        """Montgomery-form digit array -> object array of ints.

        The Montgomery un-scaling runs on host (one big-int multiply per
        element) — the device->host fetch is unavoidable here anyway, and
        a device from_mont would cost an XLA compile per input shape."""
        return dg.digits_to_ints(np.asarray(arr)) \
            * self.r_inv_mod_q % self.q

    def to_mont_host(self, x: int):
        return dg.digits_from_int(x % self.q * self.r_mod_q % self.q,
                                  self.n_limbs)

    def from_mont_int(self, arr) -> int:
        return int(dg.digits_to_ints(np.asarray(arr))
                   * self.r_inv_mod_q % self.q)

    # -- ring ops ------------------------------------------------------------
    def add(self, a, b):
        s, _ = dg.add_digits(a, b)
        d, ge = dg.sub_digits(s, self.q_digits)
        return dg.select(ge, d, s)

    def sub(self, a, b):
        d, ge = dg.sub_digits(a, b)
        wrapped, _ = dg.add_digits(d, self.q_digits)
        return dg.select(ge, d, wrapped)

    def neg(self, a):
        z = jnp.zeros_like(a)
        return dg.select(dg.is_zero_digits(a), z, self.sub(z, a))

    def mul(self, a, b):
        """Montgomery product: one variable digit conv (VPU) + two
        constant-Toeplitz MXU matmuls + log-depth carries.

        T = a*b; m = (T mod R) * q' mod R; t = (T + m*q) / R < 2q; then one
        conditional subtract -> canonical.  The q'/q convolutions have a
        constant operand, so they run as f32 matmuls on the MXU
        (dg.conv_const) — only the a*b product pays the batched rank-1
        VPU cost.
        """
        return self._reduce(dg.conv_full(a, b, 2 * self.n_limbs))

    def square(self, a):
        """Montgomery square: triangular conv (~half the VPU multiplies)."""
        return self._reduce(dg.conv_square(a, 2 * self.n_limbs))

    def _reduce(self, t_cols):
        """Montgomery-reduce full product columns to a canonical element."""
        D = self.n_limbs
        T, _ = dg.exact_norm(t_cols)
        m_cols = dg.conv_const(T[..., :D], self._np_digits_np, D)
        m, _ = dg.exact_norm(m_cols)
        u_cols = dg.conv_const(m, self._q_digits_np, 2 * D)
        U, _ = dg.exact_norm(u_cols)
        S, _ = dg.add_digits(T, U)
        t = S[..., D:]                       # low D digits are exactly zero
        d, ge = dg.sub_digits(t, self.q_digits)
        return dg.select(ge, d, t)

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    def to_mont(self, a):
        r2 = jnp.broadcast_to(
            dg.digits_from_int(self.r2_mod_q, self.n_limbs), a.shape)
        return self.mul(a, r2)

    # -- exponentiation ------------------------------------------------------
    def inv(self, a):
        """a^{-1} via Fermat (a^(q-2)); fori_loop over exponent bits."""
        return self.pow_const(a, self.q - 2)

    def pow_const(self, a, e: int):
        """a^e for static e, square-and-multiply with a one-body loop."""
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)],
                           dtype=jnp.int32)

        def body(i, carry):
            result, base = carry
            hit = self.mul(result, base)
            result = jnp.where((bits[i] == 1)[..., None], hit, result)
            base = self.square(base)
            return (result, base)

        result = jnp.broadcast_to(self.one_mont, a.shape)
        result, _ = jax.lax.fori_loop(0, nbits, body, (result, a))
        return result

    def sqrt(self, a):
        """Square root for q == 3 mod 4: a^((q+1)/4); caller checks validity."""
        if self.q % 4 != 3:
            raise NotImplementedError("sqrt only for q = 3 mod 4")
        return self.pow_const(a, (self.q + 1) // 4)

    # -- predicates ----------------------------------------------------------
    def is_zero(self, a):
        return dg.is_zero_digits(a)

    def eq(self, a, b):
        return dg.eq_digits(a, b)

    def select(self, pred, a, b):
        return dg.select(pred, a, b)


def bn254_fq() -> Field:
    return Field(BN254_FQ, 32)


def bn254_fr() -> Field:
    return Field(BN254_FR, 32)


def bls12_381_fq() -> Field:
    return Field(BLS12_381_FQ, 48)


def bls12_381_fr() -> Field:
    return Field(BLS12_381_FR, 32)
