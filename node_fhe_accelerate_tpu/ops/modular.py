"""Modular arithmetic over Z_q (q < 2^63) on uint32 limb planes.

TPU-native equivalent of the reference's `ModularArithmetic`
(cpp/src/modular_arithmetic.cpp:52-247: Montgomery with R=2^64, Barrett with
mu=floor(2^64/q), add/sub with conditional subtraction).  Three reduction
strategies:

* **Solinas** — every NTT prime shipped by the reference
  (cpp/src/parameter_set.cpp:22-42) has the form q = 2^k - 2^m + 1, so
  2^k ≡ 2^m - 1 (mod q) and a 128-bit product reduces with a handful of
  shift/multiply-by-(2^m-1)/add rounds.  This is the fast path: pure
  VPU-friendly shifts and adds, no 32-bit multiplies at all.
* **Montgomery** — R=2^64 CIOS on limb planes, identical math to
  `montgomery_reduce` (modular_arithmetic.cpp:84-111).  Used for generic odd
  moduli and as the plain-product fallback.
* Plain (value-domain) multiply for any odd q via two Montgomery multiplies.

All ops are elementwise over arbitrary leading shapes; results are
bit-identical to Python big-int arithmetic (tests/test_modular.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .u64 import (
    U32,
    addc32,
    subb32,
    u64_zeros,
    u64_add,
    u64_sub,
    u64_lt,
    u64_geq,
    u64_select,
    u64_from_int,
    u64_from_np,
    u64_to_np,
    u64_mul_lo,
    u64_mul_wide,
    u64_shl,
    u64_shr,
    u64_and_mask,
    u128_add,
    u128_shr,
    u128_lo64,
)


def _u128_shl(a, k: int):
    """(a << k) mod 2^128 for static 0 <= k < 128 on 4-plane values."""
    if k == 0:
        return a
    word = k // 32
    bit = k % 32
    z = jnp.zeros_like(a[0])
    planes = [z] * word + list(a[: 4 - word])
    if bit == 0:
        return tuple(planes)
    out = []
    prev = z
    for i in range(4):
        out.append((planes[i] << bit) | (prev >> (32 - bit)))
        prev = planes[i]
    return tuple(out)


def _u128_sub(a, b):
    """(a - b) mod 2^128 on 4-plane values."""
    w0, brw = subb32(a[0], b[0])
    w1, brw = subb32(a[1], b[1], brw)
    w2, brw = subb32(a[2], b[2], brw)
    w3 = a[3] - b[3] - brw
    return (w0, w1, w2, w3)


def _u128_and_mask(a, mask: int):
    out = []
    for i in range(4):
        out.append(a[i] & np.uint32((mask >> (32 * i)) & 0xFFFFFFFF))
    return tuple(out)


def solinas_form(q: int):
    """Return (k, m) if q == 2^k - 2^m + 1 with 0 < m <= k - 8, else None.

    The k - m >= 8 guard keeps the reduction loop short (each round removes
    k - m bits); moduli that fail it fall back to Fermat or Montgomery.
    """
    for k in range(2, 64):
        rest = (1 << k) + 1 - q
        if rest <= 1:
            continue
        if rest & (rest - 1) == 0:  # power of two
            m = rest.bit_length() - 1
            if 0 < m <= k - 8 and (1 << k) - (1 << m) + 1 == q:
                return (k, m)
    return None


def fermat_form(q: int):
    """Return e if q == 2^e + 1 (so 2^e == -1 mod q), else None."""
    e = (q - 1).bit_length() - 1
    return e if (1 << e) + 1 == q else None


class ModCtx:
    """Precomputed context for arithmetic mod a fixed odd q < 2^63.

    Mirrors the role of `MontgomeryConstants`/`BarrettReducer`
    (cpp/src/modular_arithmetic.cpp:52-71, :238-247) but chooses the
    reduction strategy once at construction.
    """

    def __init__(self, q: int):
        if q % 2 == 0 or not (2 < q < (1 << 63)):
            raise ValueError("q must be odd and in (2, 2^63)")
        self.q = q
        self.q_planes = None  # lazily broadcast
        self.solinas = solinas_form(q)
        self.fermat = fermat_form(q)
        # Montgomery constants, R = 2^64
        self.r_mod_q = (1 << 64) % q
        self.r2_mod_q = pow(self.r_mod_q, 2, q)
        self.q_inv_neg = (-pow(q, -1, 1 << 64)) % (1 << 64)  # -q^-1 mod 2^64

    # -- constants as broadcastable planes --------------------------------
    def _c(self, value: int):
        return u64_from_int(value)

    @property
    def qp(self):
        return self._c(self.q)

    # -- add / sub ---------------------------------------------------------
    def add(self, a, b):
        """(a + b) mod q; inputs must be < q (so the u64 sum cannot wrap)."""
        s = u64_add(a, b)
        q = self.qp
        return u64_select(u64_geq(s, q), u64_sub(s, q), s)

    def sub(self, a, b):
        """(a - b) mod q; inputs must be < q."""
        d = u64_sub(a, b)
        dq = u64_add(d, self.qp)
        return u64_select(u64_lt(a, b), dq, d)

    def neg(self, a):
        """(-a) mod q; input must be < q."""
        z = (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))
        d = u64_sub(self.qp, a)
        is_zero = (a[0] == 0) & (a[1] == 0)
        return u64_select(is_zero, z, d)

    # -- reduction ---------------------------------------------------------
    def reduce_128(self, t):
        """Reduce a 4-plane u128 product (< q^2) to a canonical residue < q."""
        if self.fermat is not None:
            return self._fermat_reduce(t)
        if self.solinas is not None:
            return self._solinas_reduce(t)
        return self._mont_plain_reduce(t)

    def _fermat_reduce(self, t):
        """Reduce mod q = 2^e + 1 using 2^e = -1: alternating chunk sums."""
        e = self.fermat
        q = self.q
        mask = (1 << e) - 1
        n_chunks = (126 + e - 1) // e
        z = jnp.zeros_like(t[0])
        pos = (z, z)
        neg = (z, z)
        n_neg = 0
        for i in range(n_chunks):
            chunk = u128_lo64(u128_shr(t, e * i)) if i else u128_lo64(t)
            chunk = u64_and_mask(chunk, mask)
            if i % 2 == 0:
                pos = u64_add(pos, chunk)
            else:
                neg = u64_add(neg, chunk)
                n_neg += 1
        # acc = pos - neg + n_neg*q  (non-negative since q > 2^e >= any chunk)
        y = u64_add(u64_sub(pos, neg), self._c(n_neg * q))
        bound = ((n_chunks + 1) // 2) * mask + n_neg * q  # static upper bound
        assert bound < (1 << 64)
        # Fold: y = (y & mask) + q - (y >> e); since y >> e < q this lands
        # in [0, mask + q) subset [0, 2q).  Repeat while the bound says the
        # high part can be nonzero.
        while bound >= 2 * q:
            hi_bound = bound >> e
            k_mult = hi_bound // q + 1  # k_mult*q >= any possible hi value
            hi = u64_shr(y, e)
            lo = u64_and_mask(y, mask)
            y = u64_sub(u64_add(lo, self._c(k_mult * q)), hi)
            new_bound = mask + k_mult * q
            assert new_bound < bound, "fermat fold must converge"
            bound = new_bound
        qp = self.qp
        return u64_select(u64_geq(y, qp), u64_sub(y, qp), y)

    def _solinas_reduce(self, t):
        k, m = self.solinas
        q = self.q
        # Track a static upper bound on the value to emit just enough rounds.
        bound = 1 << 126
        factor = (1 << m) - 1
        lo_mask = (1 << k) - 1
        x = t
        while bound >= (1 << 64):
            hi = u128_shr(x, k)                       # x >> k
            lo = _u128_and_mask(x, lo_mask)           # x & (2^k - 1)
            # x' = hi * (2^m - 1) + lo = (hi << m) - hi + lo
            hi_shift = _u128_shl(hi, m)
            x = u128_add(_u128_sub(hi_shift, hi), lo)
            bound = (bound >> k) * factor + lo_mask + 1
        # Now the value fits in u64; continue on 2 planes.
        y = u128_lo64(x)
        while bound > 2 * q:
            hi = u64_shr(y, k)
            lo = u64_and_mask(y, lo_mask)
            hi_shift = u64_shl(hi, m)
            y = u64_add(u64_sub(hi_shift, hi), lo)
            bound = (bound >> k) * factor + lo_mask + 1
        qp = self.qp
        return u64_select(u64_geq(y, qp), u64_sub(y, qp), y)

    def _mont_reduce(self, t):
        """Montgomery reduction: t * R^-1 mod q for t < q * 2^64."""
        t_lo = u128_lo64(t)
        m = u64_mul_lo(t_lo, self._c(self.q_inv_neg))
        mq = u64_mul_wide(m, self.qp)
        s = u128_add(t, mq)
        r = (s[2], s[3])  # (t + m*q) >> 64; low 64 bits are zero by design
        qp = self.qp
        return u64_select(u64_geq(r, qp), u64_sub(r, qp), r)

    def _mont_plain_reduce(self, t):
        """Plain reduction of t < 2^126 via two Montgomery passes.

        mont(t) = t R^-1; multiplying by R^2 and reducing again yields t mod q.
        """
        t1 = self._mont_reduce(t)                 # t * R^-1
        t2 = u64_mul_wide(t1, self._c(self.r2_mod_q))
        return self._mont_reduce(t2)              # t * R^-1 * R^2 * R^-1 = t

    # -- multiplication ----------------------------------------------------
    def mul(self, a, b):
        """Plain (a * b) mod q; inputs must be < q."""
        return self.reduce_128(u64_mul_wide(a, b))

    def mont_mul(self, a, b):
        """Montgomery product a*b*R^-1 mod q (matches montgomery_mul,
        modular_arithmetic.cpp:130-143)."""
        return self._mont_reduce(u64_mul_wide(a, b))

    def to_mont(self, a):
        return self.mont_mul(a, self._c(self.r2_mod_q))

    def from_mont(self, a):
        z = jnp.zeros_like(a[0])
        return self._mont_reduce((a[0], a[1], z, z))

    # -- host-side helpers ---------------------------------------------------
    def pow_host(self, base: int, exp: int) -> int:
        return pow(base, exp, self.q)

    def inv_host(self, a: int) -> int:
        return pow(a, -1, self.q)


def mod_mul_np(a, b, q: int):
    """Host oracle: elementwise (a*b) mod q on numpy uint64 via Python ints."""
    a = np.asarray(a, dtype=np.uint64).astype(object)
    b = np.asarray(b, dtype=np.uint64).astype(object)
    return ((a * b) % q).astype(np.uint64)


__all__ = [
    "ModCtx",
    "solinas_form",
    "mod_mul_np",
    "u64_from_int",
    "u64_from_np",
    "u64_to_np",
]
