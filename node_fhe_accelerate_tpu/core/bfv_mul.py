"""Correct BFV tensor multiply with t/q rescale.

The reference's decrypt semantics are round(phase * t / q) mod t
(cpp/src/encryption.cpp:234-301) and its multiply is the raw NTT tensor
product (:737-799) — composing them requires the BFV rescale
d_i = round(t/q * (ct (x) ct')_i) computed over the INTEGERS, which the
reference never implements (its multiply only decodes at Delta^2 with zero
noise).  This module supplies the real thing, TPU-style:

1. lift ciphertext polynomials to centered representatives and compute the
   negacyclic tensor products EXACTLY over Z via CRT on enough auxiliary
   NTT primes (|coeff| <= N * (q/2)^2 * 2, so M = prod p_i > N*q^2 covers
   the centered range);
2. CRT-recombine the residues into base-256 digit planes on device
   (ops/digits.py: MXU f32 conv products + cummax carry lookahead);
3. rescale: y = floor((t*X + q/2) * MU >> K) with MU = floor(2^K / q) — a
   Barrett-style division whose off-by-one (probability ~2^-24) adds at
   most one unit of noise, which BFV absorbs;
4. reduce y mod q back to u64 limb planes.

Everything is elementwise over (batch, N) coefficients and fuses under jit;
the NTTs are the standard limb-plane transforms (ops/ntt.py).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.modular import ModCtx
from ..ops.ntt import NTTContext
from ..ops import digits as dg
from ..ops.primes import find_ntt_prime, two_adicity
from ..ops.u64 import U32, u64_from_int

__all__ = ["RescaleMultiplier", "RnsRescaleMultiplier", "aux_prime_chain"]


def aux_prime_chain(degree: int, min_product_bits: int,
                    exclude: tuple = ()) -> list:
    """Distinct ~59-bit NTT-friendly primes whose product exceeds
    2^min_product_bits (auxiliary CRT basis for exact tensor products)."""
    primes = []
    below = None
    bits = 0
    while bits < min_product_bits:
        p = find_ntt_prime(59, degree, below=below)
        if p not in exclude:
            primes.append(p)
            bits += p.bit_length() - 1
        below = p
    return primes


def _conv(a, b, out_len: int):
    """dg.conv_full for unequal digit counts (zero-pad the shorter)."""
    da, db = a.shape[-1], b.shape[-1]
    d = max(da, db)
    if da < d:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, d - da)])
    if db < d:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, d - db)])
    return dg.conv_full(a, b, out_len=out_len)


def _u64_to_digits(planes, n_digits: int = 8):
    """u64 limb planes -> strict base-256 digits (int32, little-endian)."""
    lo, hi = planes
    out = []
    for i in range(min(4, n_digits)):
        out.append(((lo >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(dg.I32))
    for i in range(4, n_digits):
        out.append(((hi >> jnp.uint32(8 * (i - 4))) & jnp.uint32(0xFF)
                    ).astype(dg.I32))
    return jnp.stack(out, axis=-1)


def _digits_to_u128_planes(digits):
    """Low 128 bits of a strict digit array -> 4 uint32 planes."""
    d = digits.astype(jnp.uint32)
    planes = []
    nd = digits.shape[-1]
    for w in range(4):
        acc = jnp.zeros(digits.shape[:-1], U32)
        for b in range(4):
            i = 4 * w + b
            if i < nd:
                acc = acc | (d[..., i] << jnp.uint32(8 * b))
        planes.append(acc)
    return tuple(planes)


class RescaleMultiplier:
    """BFV multiply-with-rescale over a single ciphertext modulus q.

    Reference semantics: encryption.cpp:737-799 (tensor product) composed
    with :234-301 (round(t/q * .) decode) — i.e. standard BFV
    (Fan-Vercauteren) multiplication.
    """

    def __init__(self, degree: int, q: int, t: int):
        self.n = degree
        self.q = q
        self.t = t
        self.qctx = ModCtx(q)

        # ---- auxiliary CRT basis: M > 2 * bound, bound = N * q^2 / 2
        bound_bits = degree.bit_length() + 2 * q.bit_length() + 2
        self.aux_primes = aux_prime_chain(degree, bound_bits)
        self.aux_ntt = [NTTContext(degree, p) for p in self.aux_primes]
        self.aux_ctx = [n.ctx for n in self.aux_ntt]
        M = math.prod(self.aux_primes)
        self.M = M

        # Host constants -> device digit constants
        self.d_m = (M.bit_length() + 8) // 8 + 1       # digits for X < 3M
        self._m_digits = dg.digits_from_int(M, self.d_m)
        self._m_half_digits = dg.digits_from_int(M // 2, self.d_m)
        self._mi_digits = []                            # M_i = M / p_i
        self._inv_mi = []                               # (M_i)^-1 mod p_i
        dmi = (max((M // p).bit_length() for p in self.aux_primes) + 7) // 8
        for p in self.aux_primes:
            mi = M // p
            self._mi_digits.append(dg.digits_from_int(mi, dmi))
            self._inv_mi.append(u64_from_int(pow(mi % p, -1, p)))
        self.d_mi = dmi

        # Rescale constants: y = floor((t*X + q/2) * MU / 2^K)
        z_bits = t.bit_length() + bound_bits + 1
        self.K = ((z_bits + 24) + 7) // 8 * 8           # >= 24 bits margin
        self.mu = (1 << self.K) // q
        self.d_t = max(1, (t.bit_length() + 7) // 8)
        self._t_digits = dg.digits_from_int(t, self.d_t)
        self.d_z = self.d_m + self.d_t + 1
        self._qhalf_digits = dg.digits_from_int(q // 2, self.d_z)
        self.d_mu = (self.mu.bit_length() + 7) // 8
        self._mu_digits = dg.digits_from_int(self.mu, self.d_mu)
        # centered lift constants per aux prime: q mod p, (q/2, canonical)
        self._q_mod_p = [u64_from_int(q % p) for p in self.aux_primes]
        self._q_half = u64_from_int(q // 2)

    # -- lifting ------------------------------------------------------------
    def _lift_centered(self, planes, i: int):
        """Canonical [0, q) u64 planes -> centered residue mod aux prime i.

        value v > q/2 represents v - q: residue = (v mod p) - (q mod p)."""
        ctx = self.aux_ctx[i]
        lo, hi = planes
        z = jnp.zeros_like(lo)
        r = ctx.reduce_128((lo, hi, z, z))
        qh = self._q_half
        is_neg = (hi > qh[1]) | ((hi == qh[1]) & (lo > qh[0]))
        r_neg = ctx.sub(r, self._q_mod_p[i])
        return (jnp.where(is_neg, r_neg[0], r[0]),
                jnp.where(is_neg, r_neg[1], r[1]))

    # -- exact tensor product ----------------------------------------------
    def tensor_residues(self, a0, a1, b0, b1):
        """Per-aux-prime negacyclic tensor products of centered lifts.

        Returns [(d0, d1, d2)] per prime, each u64 planes (..., N)."""
        out = []
        for i, ntt in enumerate(self.aux_ntt):
            ctx = ntt.ctx
            fa0 = ntt.forward(self._lift_centered(a0, i))
            fa1 = ntt.forward(self._lift_centered(a1, i))
            fb0 = ntt.forward(self._lift_centered(b0, i))
            fb1 = ntt.forward(self._lift_centered(b1, i))
            d0 = ntt.inverse(ctx.mul(fa0, fb0))
            d1 = ntt.inverse(ctx.add(ctx.mul(fa0, fb1), ctx.mul(fa1, fb0)))
            d2 = ntt.inverse(ctx.mul(fa1, fb1))
            out.append((d0, d1, d2))
        return out

    # -- CRT recombination + rescale ----------------------------------------
    def _crt_digits(self, residues):
        """Residues (u64 planes per prime) -> centered |X| digits + sign."""
        cols = None
        for i, r in enumerate(residues):
            ti = self.aux_ctx[i].mul(r, self._inv_mi[i])
            td = _u64_to_digits(ti, 8)
            c = _conv(td, self._mi_digits[i], out_len=self.d_m)
            cols = c if cols is None else cols + c
        x, _ = dg.exact_norm(cols)
        # X < len(primes) * M: reduce by conditional subtraction
        for _ in range(len(self.aux_primes) - 1):
            d, ge = dg.sub_digits(x, self._m_digits)
            x = dg.select(ge, d, x)
        # center: sign = [X > M/2]; |X| = M - X when negative
        neg = ~dg.geq_digits(self._m_half_digits, x)    # X > M/2
        m_minus_x, _ = dg.sub_digits(self._m_digits, x)
        return dg.select(neg, m_minus_x, x), neg

    def _rescale_digits(self, xd, neg):
        """round(t * X / q) mod q from |X| digits + sign -> u64 planes."""
        zc = _conv(xd, self._t_digits, out_len=self.d_z)
        zc = zc + self._qhalf_digits
        z, _ = dg.exact_norm(zc)
        yc = _conv(z, self._mu_digits, out_len=self.d_z + self.d_mu)
        y, _ = dg.exact_norm(yc)
        y = y[..., self.K // 8:]                        # >> K
        r = self.qctx.reduce_128(_digits_to_u128_planes(y))
        r_neg = self.qctx.neg(r)
        return (jnp.where(neg, r_neg[0], r[0]),
                jnp.where(neg, r_neg[1], r[1]))

    def multiply(self, a0, a1, b0, b1):
        """(d0, d1, d2) = round(t/q * (a (x) b)) mod q, exact BFV tensor
        multiply with rescale.  Inputs/outputs: u64 planes (..., N)."""
        residues = self.tensor_residues(a0, a1, b0, b1)
        out = []
        for comp in range(3):
            xd, neg = self._crt_digits([r[comp] for r in residues])
            out.append(self._rescale_digits(xd, neg))
        return tuple(out)


# ---------------------------------------------------------------------------
# RNS (multi-modulus) variant
# ---------------------------------------------------------------------------

class _DigitsModP:
    """Reduce a strict base-256 digit array mod p on device.

    Digits group into 24-bit chunks (exact in int32), then a dot against a
    precomputed (2^24)^j mod p table of u64-plane constants: D digits cost
    ceil(D/3) modmuls instead of D."""

    def __init__(self, ctx: ModCtx, max_digits: int):
        self.ctx = ctx
        n_chunks = (max_digits + 2) // 3
        p = ctx.q
        self._pow = [u64_from_int(pow(1 << 24, j, p)) for j in range(n_chunks)]

    def __call__(self, digits):
        d = digits
        pad = (-d.shape[-1]) % 3
        if pad:
            d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, pad)])
        chunks = (d[..., 0::3] + 256 * d[..., 1::3]
                  + 65536 * d[..., 2::3]).astype(U32)
        acc = None
        for j in range(chunks.shape[-1]):
            term = self.ctx.mul((chunks[..., j], jnp.zeros_like(chunks[..., j])),
                                self._pow[j])
            acc = term if acc is None else self.ctx.add(acc, term)
        return acc


class RnsRescaleMultiplier:
    """BFV multiply-with-rescale over an RNS moduli chain Q = prod q_i.

    Same semantics as :class:`RescaleMultiplier` with q -> Q, except
    ciphertext polynomials come and go as RNS residue tuples (one u64-plane
    pair per q_i).  Pipeline:

    1. exact CRT recombination of the input residues into centered
       base-256 digit representatives of X in (-Q/2, Q/2] (digit planes —
       no floating-point alpha estimation, so no BEHZ/HPS boundary error);
    2. reduce the digits mod each auxiliary NTT prime (24-bit chunk dot);
    3. negacyclic tensor products per aux prime (exact over Z since
       M = prod p_j > N * Q^2);
    4. recombine to |X| digits over the aux basis, Barrett-rescale
       y = round(t*X/Q), and reduce y mod each output prime.

    Reference semantics: encryption.cpp:737-799 + :234-301; RNS-readiness:
    polynomial_ring.h:504-508 (the reference carries moduli chains in its
    presets but only ever computes on moduli[0]).
    """

    def __init__(self, degree: int, moduli: list, t: int):
        self.n = degree
        self.moduli = list(moduli)
        self.t = t
        Q = math.prod(self.moduli)
        self.Q = Q
        self.qctx = [ModCtx(q) for q in self.moduli]

        # ---- input basis constants (exact CRT lift of RNS -> digits)
        self.d_q = (Q.bit_length() + 8) // 8 + 1        # digits for X < K*Q
        self._q_digits = dg.digits_from_int(Q, self.d_q)
        self._q_half_digits = dg.digits_from_int(Q // 2, self.d_q)
        self._inv_qi_star = []                          # (Q/q_i)^-1 mod q_i
        self._qi_star_digits = []                       # Q/q_i as digits
        dqi = (max((Q // q).bit_length() for q in self.moduli) + 7) // 8
        for q in self.moduli:
            qi_star = Q // q
            self._inv_qi_star.append(u64_from_int(pow(qi_star % q, -1, q)))
            self._qi_star_digits.append(dg.digits_from_int(qi_star, dqi))
        self.d_qi = dqi

        # ---- auxiliary basis: M > 2 * N * (Q/2)^2
        bound_bits = degree.bit_length() + 2 * Q.bit_length() + 2
        self.aux_primes = aux_prime_chain(degree, bound_bits,
                                          exclude=tuple(self.moduli))
        self.aux_ntt = [NTTContext(degree, p) for p in self.aux_primes]
        self.aux_ctx = [c.ctx for c in self.aux_ntt]
        M = math.prod(self.aux_primes)
        self.M = M
        self.d_m = (M.bit_length() + 8) // 8 + 1
        self._m_digits = dg.digits_from_int(M, self.d_m)
        self._m_half_digits = dg.digits_from_int(M // 2, self.d_m)
        self._mi_digits = []
        self._inv_mi = []
        dmi = (max((M // p).bit_length() for p in self.aux_primes) + 7) // 8
        for p in self.aux_primes:
            mi = M // p
            self._mi_digits.append(dg.digits_from_int(mi, dmi))
            self._inv_mi.append(u64_from_int(pow(mi % p, -1, p)))
        self.d_mi = dmi

        # ---- rescale constants: y = floor((t*X + Q/2) * MU >> K)
        z_bits = t.bit_length() + bound_bits + 1
        self.K = ((z_bits + 24) + 7) // 8 * 8
        self.mu = (1 << self.K) // Q
        self.d_t = max(1, (t.bit_length() + 7) // 8)
        self._t_digits = dg.digits_from_int(t, self.d_t)
        self.d_z = self.d_m + self.d_t + 1
        self._qhalf_z_digits = dg.digits_from_int(Q // 2, self.d_z)
        self.d_mu = (self.mu.bit_length() + 7) // 8
        self._mu_digits = dg.digits_from_int(self.mu, self.d_mu)
        self.d_y = self.d_z + self.d_mu - self.K // 8   # digits of y < t*N*Q/2

        # digit -> mod-p reducers
        self._aux_red = [_DigitsModP(c, self.d_q) for c in self.aux_ctx]
        self._out_red = [_DigitsModP(c, self.d_y) for c in self.qctx]

    # -- RNS residues -> centered digit representative -----------------------
    def _rns_to_centered_digits(self, rns_planes):
        """[(lo, hi)] per input prime -> (|X| digits, neg mask) with
        X = CRT(residues) in (-Q/2, Q/2]."""
        cols = None
        for i, r in enumerate(rns_planes):
            ti = self.qctx[i].mul(r, self._inv_qi_star[i])
            td = _u64_to_digits(ti, 8)
            c = _conv(td, self._qi_star_digits[i], out_len=self.d_q)
            cols = c if cols is None else cols + c
        x, _ = dg.exact_norm(cols)
        for _ in range(len(self.moduli) - 1):            # X < K*Q -> [0, Q)
            d, ge = dg.sub_digits(x, self._q_digits)
            x = dg.select(ge, d, x)
        neg = ~dg.geq_digits(self._q_half_digits, x)     # X > Q/2
        q_minus_x, _ = dg.sub_digits(self._q_digits, x)
        return dg.select(neg, q_minus_x, x), neg

    def _lift_to_aux(self, rns_planes):
        """RNS residues -> centered residue mod every aux prime."""
        xd, neg = self._rns_to_centered_digits(rns_planes)
        out = []
        for j, ctx in enumerate(self.aux_ctx):
            r = self._aux_red[j](xd)
            r_neg = ctx.neg(r)
            out.append((jnp.where(neg, r_neg[0], r[0]),
                        jnp.where(neg, r_neg[1], r[1])))
        return out

    # -- aux-basis recombination (same shape as RescaleMultiplier._crt_digits)
    def _crt_digits_aux(self, residues):
        cols = None
        for i, r in enumerate(residues):
            ti = self.aux_ctx[i].mul(r, self._inv_mi[i])
            td = _u64_to_digits(ti, 8)
            c = _conv(td, self._mi_digits[i], out_len=self.d_m)
            cols = c if cols is None else cols + c
        x, _ = dg.exact_norm(cols)
        for _ in range(len(self.aux_primes) - 1):
            d, ge = dg.sub_digits(x, self._m_digits)
            x = dg.select(ge, d, x)
        neg = ~dg.geq_digits(self._m_half_digits, x)
        m_minus_x, _ = dg.sub_digits(self._m_digits, x)
        return dg.select(neg, m_minus_x, x), neg

    def _rescale_to_rns(self, xd, neg):
        """round(t * X / Q) mod q_i for every output prime -> RNS planes."""
        zc = _conv(xd, self._t_digits, out_len=self.d_z)
        zc = zc + self._qhalf_z_digits
        z, _ = dg.exact_norm(zc)
        yc = _conv(z, self._mu_digits, out_len=self.d_z + self.d_mu)
        y, _ = dg.exact_norm(yc)
        y = y[..., self.K // 8:]                         # >> K
        out = []
        for i, ctx in enumerate(self.qctx):
            r = self._out_red[i](y)
            r_neg = ctx.neg(r)
            out.append((jnp.where(neg, r_neg[0], r[0]),
                        jnp.where(neg, r_neg[1], r[1])))
        return out

    def multiply(self, a0, a1, b0, b1):
        """Exact RNS BFV multiply: inputs are residue lists [(lo, hi)] per
        modulus; returns (d0, d1, d2) each a residue list."""
        la0 = self._lift_to_aux(a0)
        la1 = self._lift_to_aux(a1)
        lb0 = self._lift_to_aux(b0)
        lb1 = self._lift_to_aux(b1)
        residues = []
        for i, ntt in enumerate(self.aux_ntt):
            ctx = ntt.ctx
            fa0, fa1 = ntt.forward(la0[i]), ntt.forward(la1[i])
            fb0, fb1 = ntt.forward(lb0[i]), ntt.forward(lb1[i])
            d0 = ntt.inverse(ctx.mul(fa0, fb0))
            d1 = ntt.inverse(ctx.add(ctx.mul(fa0, fb1), ctx.mul(fa1, fb0)))
            d2 = ntt.inverse(ctx.mul(fa1, fb1))
            residues.append((d0, d1, d2))
        out = []
        for comp in range(3):
            xd, neg = self._crt_digits_aux([r[comp] for r in residues])
            out.append(tuple(self._rescale_to_rns(xd, neg)))
        return tuple(out)
