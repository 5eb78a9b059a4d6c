"""Torus ring Z_{2^32}[X]/(X^N+1) — the TFHE bootstrapping domain.

The reference reserves `Q_TFHE_BOOT = 2^32` (parameter_set.cpp:40) but never
uses it; its bootstrap instead runs over a (composite) 40-bit "prime" with a
gadget whose decomposition extracts the LOW bits while the gadget constants
scale the TOP bits (bootstrap_engine.cpp:152-184 vs :283-292) — the external
product of a Delta-scaled accumulator is therefore ~zero and its CMux/blind
rotate cannot work.  This build implements the textbook torus-2^32 TFHE
instead, which is also the TPU-native choice:

* torus elements are single uint32 lanes — mod-2^32 arithmetic is free
  (native wraparound), no limb carries, pure VPU;
* gadget decomposition is exact bit-slicing with signed balanced digits;
* rotation amounts round(x * 2N / 2^32) are exact top-bit shifts;
* the only nontrivial op — negacyclic polynomial multiply mod 2^32 — is done
  EXACTLY over the integers via CRT on two Solinas NTT primes
  (p1 = 2^40-2^32+1, p2 = 2^37-2^17+1; p1*p2 ~ 2^77 > 2*N*2^62 covers all
  centered products for N <= 2^13), then reduced mod 2^32.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ntt import NTTContext
from ..ops.u64 import (
    U32, u64_from_int, u64_mul_wide, u128_add, u64_to_np,
)

__all__ = ["TorusRing", "P1", "P2", "P_EXT"]

P1 = (1 << 40) - (1 << 32) + 1   # two-adicity 32
P2 = (1 << 37) - (1 << 17) + 1   # two-adicity 17
P_EXT = (1 << 54) - (1 << 24) + 1  # single-prime external-product modulus


class TorusRing:
    """Negacyclic ring over Z_{2^32}; CRT-NTT exact multiply."""

    def __init__(self, degree: int):
        if degree & (degree - 1):
            raise ValueError("degree must be a power of two")
        self.n = degree
        self.logn = degree.bit_length() - 1
        self.ntt1 = NTTContext(degree, P1)
        self.ntt2 = NTTContext(degree, P2)
        # CRT constants: t = (r2 - r1) * p1^{-1} mod p2; c = r1 + p1 * t
        self.p1_inv_mod_p2 = pow(P1, -1, P2)
        self.m_half = (P1 * P2) // 2
        self.p1p2_mod_2_32 = (P1 * P2) % (1 << 32)
        self.p1_mod_2_32 = P1 % (1 << 32)
        # Built eagerly: twiddle tables created inside a jit trace would be
        # tracers and leak across traces.
        self.ntt_ext = NTTContext(degree, P_EXT)

    # -- basic ops (native wraparound) --------------------------------------
    @staticmethod
    def add(a, b):
        return a + b

    @staticmethod
    def sub(a, b):
        return a - b

    @staticmethod
    def neg(a):
        return jnp.uint32(0) - a

    @staticmethod
    def _roll_neg(a, s: int):
        """Static negacyclic roll: X^s * a for compile-time s in [0, N)."""
        if s == 0:
            return a
        head = jnp.uint32(0) - a[..., -s:]   # wrapped coefficients negate
        return jnp.concatenate([head, a[..., :-s]], axis=-1)

    def rotate(self, a, r):
        """X^r * a mod (X^N + 1) for traced r (int32, any value; mod 2N).

        Binary ladder of STATIC negacyclic rolls selected per element by the
        bits of r — log2(2N) slice+concat+select sweeps.  This replaces a
        take_along_axis gather which dominates blind-rotate time on TPU
        (per-element gathers are slow; static rolls are bandwidth-speed).
        r must be broadcastable against a.shape[:-1].
        """
        n = self.n
        r = jnp.asarray(r, jnp.int32) % (2 * n)
        out = a
        # bit log2(n) (value n): X^n = -1 -> negate
        for i in range(self.logn + 1):
            s = 1 << i
            bit = ((r >> i) & 1) == 1
            if s < n:
                rolled = self._roll_neg(out, s)
            else:                       # s == n: X^n * a = -a
                rolled = jnp.uint32(0) - out
            out = jnp.where(jnp.broadcast_to(bit[..., None], out.shape),
                            rolled, out)
        return out

    # -- signed gadget decomposition ----------------------------------------
    def decompose(self, a, base_log: int, level: int):
        """Signed balanced digits of the top level*base_log bits.

        Returns int32 digits of shape (level,) + a.shape with
        sum_l digits[l] * 2^(32 - (l+1)*base_log) ~ a (error < 2^(31-l*B)).
        Digits lie in [-B/2, B/2].
        """
        b = base_log
        total = level * b
        half = jnp.uint32(1 << (b - 1))
        # Round to the closest multiple of 2^(32-total)
        rounding = jnp.uint32(1 << (32 - total - 1)) if total < 32 else jnp.uint32(0)
        y = (a + rounding) >> (32 - total)   # top `total` bits, in [0, 2^total]
        digits = []
        carry = jnp.zeros_like(a)
        for l in range(level - 1, -1, -1):   # least-significant gadget level first
            d = (y & jnp.uint32((1 << b) - 1)) + carry
            y = y >> b
            over = d >= half                  # balanced: d in [-B/2, B/2)
            carry = jnp.where(over, jnp.uint32(1), jnp.uint32(0))
            d_signed = jnp.where(over, d.astype(jnp.int32) - (1 << b),
                                 d.astype(jnp.int32))
            digits.append(d_signed)
        digits.reverse()                      # index l: weight 2^(32-(l+1)B)
        return jnp.stack(digits, axis=0)

    # -- CRT NTT multiply ---------------------------------------------------
    def _to_planes_centered(self, a, ntt: NTTContext):
        """Map torus u32 (centered interpretation) into Z_p limb planes."""
        p = ntt.q
        neg = a >= jnp.uint32(1 << 31)
        # value = a - 2^32 if neg else a;  mod p: a + (p - 2^32 mod p)... since
        # p > 2^32 here, a itself is < p; subtract 2^32 mod p when negative.
        two32 = np.uint64(1 << 32)
        sub_lo = np.uint32((p - (1 << 32)) % (1 << 32)) if p > (1 << 32) else 0
        # p - 2^32 for p in (2^32, 2^63): compute planes
        diff = p - (1 << 32)
        d_lo = np.uint32(diff & 0xFFFFFFFF)
        d_hi = np.uint32((diff >> 32) & 0xFFFFFFFF)
        lo = a
        hi = jnp.zeros_like(a)
        # if neg: value = a + (p - 2^32)  (still < p since a >= 2^31 > 2^32 - p? )
        add_lo = lo + d_lo
        carry = (add_lo < lo).astype(U32)
        add_hi = hi + d_hi + carry
        lo2 = jnp.where(neg, add_lo, lo)
        hi2 = jnp.where(neg, add_hi, hi)
        # Reduce once if >= p (possible when a + p - 2^32 >= p i.e. a >= 2^32 — never)
        return (lo2, hi2)

    def _digits_to_planes(self, d, ntt: NTTContext):
        """Map signed int32 digits into Z_p planes."""
        p = ntt.q
        neg = d < 0
        mag = jnp.abs(d).astype(U32)
        p_lo = np.uint32(p & 0xFFFFFFFF)
        p_hi = np.uint32((p >> 32) & 0xFFFFFFFF)
        n_lo = p_lo - mag
        borrow = (p_lo < mag).astype(U32)
        n_hi = p_hi - borrow
        lo = jnp.where(neg, n_lo, mag)
        hi = jnp.where(neg, n_hi, jnp.zeros_like(mag))
        return (lo, hi)

    def _crt_to_torus(self, r1, r2):
        """Combine residues (planes mod p1, p2) to centered value mod 2^32."""
        # t = (r2 - r1 mod p2) * p1^{-1} mod p2
        ctx2 = self.ntt2.ctx
        r1_mod_p2 = ctx2.reduce_128((r1[0], r1[1],
                                     jnp.zeros_like(r1[0]),
                                     jnp.zeros_like(r1[0])))
        t = ctx2.mul(ctx2.sub(r2, r1_mod_p2),
                     u64_from_int(self.p1_inv_mod_p2))
        # rep = r1 + p1 * t  (u128), canonical in [0, p1*p2)
        p1t = u64_mul_wide(t, u64_from_int(P1))
        rep = u128_add(p1t, (r1[0], r1[1],
                             jnp.zeros_like(r1[0]), jnp.zeros_like(r1[0])))
        # centered: subtract p1*p2 when rep >= M/2  (i.e. value was negative)
        mh = self.m_half
        mh_planes = [np.uint32((mh >> (32 * i)) & 0xFFFFFFFF) for i in range(4)]
        ge = jnp.zeros_like(rep[0], dtype=bool)
        eq = jnp.ones_like(rep[0], dtype=bool)
        for i in range(3, -1, -1):
            ge = ge | (eq & (rep[i] > mh_planes[i]))
            eq = eq & (rep[i] == mh_planes[i])
        ge = ge | eq
        # mod 2^32: low plane of rep, minus (M mod 2^32) when negative
        low = rep[0]
        return jnp.where(ge, low - jnp.uint32(self.p1p2_mod_2_32), low)

    def forward(self, a):
        """NTT forms of a torus polynomial in both CRT primes."""
        return (self.ntt1.forward(self._to_planes_centered(a, self.ntt1)),
                self.ntt2.forward(self._to_planes_centered(a, self.ntt2)))

    def forward_digits(self, d):
        """NTT forms of signed digit polynomials."""
        return (self.ntt1.forward(self._digits_to_planes(d, self.ntt1)),
                self.ntt2.forward(self._digits_to_planes(d, self.ntt2)))

    def pointwise_acc(self, pairs):
        """Sum of pointwise products [(a_hat, b_hat), ...] in NTT domain,
        per prime. Returns (acc1, acc2)."""
        ctx1, ctx2 = self.ntt1.ctx, self.ntt2.ctx
        acc1 = acc2 = None
        for (a1, a2), (b1, b2) in pairs:
            t1 = ctx1.mul(a1, b1)
            t2 = ctx2.mul(a2, b2)
            acc1 = t1 if acc1 is None else ctx1.add(acc1, t1)
            acc2 = t2 if acc2 is None else ctx2.add(acc2, t2)
        return acc1, acc2

    def inverse(self, acc):
        """Inverse NTT per prime + CRT recombination to torus u32."""
        acc1, acc2 = acc
        r1 = self.ntt1.inverse(acc1)
        r2 = self.ntt2.inverse(acc2)
        return self._crt_to_torus(r1, r2)

    def multiply(self, a, b):
        """Exact negacyclic product of torus polynomials (centered lift)."""
        fa = self.forward(a)
        fb = self.forward(b)
        return self.inverse(self.pointwise_acc([(fa, fb)]))

    def multiply_small(self, a_digits, b):
        """Product of a small (signed digit) polynomial with a torus one."""
        fa = self.forward_digits(a_digits)
        fb = self.forward(b)
        return self.inverse(self.pointwise_acc([(fa, fb)]))

    # ------------------------------------------------------------------
    # Single-prime fast path for small x torus products (external product)
    # ------------------------------------------------------------------
    # The hot TFHE loop multiplies SIGNED DIGIT polynomials (|d| <= B/2)
    # against torus polynomials: centered product coefficients are bounded
    # by N * (B/2) * 2^31, which fits ONE 50-bit prime — half the
    # transforms and no CRT recombination vs the general torus multiply.

    def ext_bound_ok(self, base_log: int, terms: int = 1) -> bool:
        """Can the single-prime path hold `terms` accumulated products?
        Centered coefficients satisfy |sum| <= terms * N * (B/2) * 2^31,
        which must stay below P_EXT / 2."""
        bound = terms * self.n * (1 << (base_log - 1)) * (1 << 31)
        return 2 * bound < P_EXT

    def forward_ext_mont(self, a):
        """Torus u32 -> centered mod P_EXT, scaled by R (Montgomery form),
        NTT'd.  Used once at keygen for the BSK; pointwise mont_mul against
        these gives standard-domain products."""
        ntt = self.ntt_ext
        ctx = ntt.ctx
        planes = self._to_planes_centered(a, ntt)
        scaled = ctx.mul(planes, u64_from_int(ctx.r_mod_q))
        return ntt.forward(scaled)

    def forward_digits_ext(self, d):
        """Signed int32 digits -> NTT mod P_EXT (standard domain)."""
        return self.ntt_ext.forward(self._digits_to_planes(d, self.ntt_ext))

    def pointwise_acc_ext(self, pairs):
        """Sum of mont_mul(d_hat, g_mont) in the NTT domain mod P_EXT."""
        ctx = self.ntt_ext.ctx
        acc = None
        for d_hat, g_mont in pairs:
            t = ctx.mont_mul(d_hat, g_mont)
            acc = t if acc is None else ctx.add(acc, t)
        return acc

    def inverse_ext_to_torus(self, acc):
        """Inverse NTT mod P_EXT + centered reduction to torus u32."""
        r = self.ntt_ext.inverse(acc)
        half = P_EXT // 2
        h_lo = np.uint32(half & 0xFFFFFFFF)
        h_hi = np.uint32(half >> 32)
        p_lo = np.uint32(P_EXT & 0xFFFFFFFF)
        neg = (r[1] > h_hi) | ((r[1] == h_hi) & (r[0] > h_lo))
        return r[0] - jnp.where(neg, p_lo, jnp.uint32(0))
