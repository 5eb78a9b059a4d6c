"""Negacyclic NTT/INTT over Z_q[X]/(X^N+1) on uint32 limb planes.

TPU-native equivalent of the reference's `NTTProcessor`
(cpp/src/ntt_processor.cpp:92-380).  The reference finds a primitive 2N-th
root psi (psi^N == -1, ntt_processor.cpp:92-128) and runs bit-reverse +
Cooley-Tukey DIT / Gentleman-Sande DIF butterflies.  **Honesty note:** the
reference's twiddle indexing (`j*(N/group_size)` on psi powers,
ntt_processor.cpp:287) yields a transform that round-trips but is NOT
multiplicative — its pointwise product does not equal the negacyclic product
(verified by direct simulation).  This build implements the *correct*
merged-twiddle negacyclic NTT (Longa-Naehrig style): forward CT with
psi-power twiddles in bit-reversed order (natural in -> bit-reversed out),
inverse GS (bit-reversed in -> natural out) + N^-1 scaling, so that

    intt(ntt(a) * ntt(b)) == a * b  mod (X^N + 1, q)      (bit-exact)

which is what the reference *intends* (polynomial_ring.cpp:421-447) and what
its TS executable spec requires of polynomial multiplication.

Design for TPU: every stage is a reshape to (..., m, 2, t) + one fused
elementwise modmul/add/sub over the whole batch — log2(N) XLA-fused VPU
sweeps, no gathers, no bit-reversal permutation at all (the CT/GS pairing
absorbs it).  Batch axes lead; under `jit` the whole forward/inverse chain
fuses into a handful of kernels.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp

from .modular import ModCtx
from .u64 import u64_from_np, u64_to_np, U32

__all__ = ["NTTContext", "find_primitive_2n_root", "negacyclic_mul_np"]


# ---------------------------------------------------------------------------
# Host-side root finding (mirrors find_primitive_root, ntt_processor.cpp:92)
# ---------------------------------------------------------------------------


def find_primitive_2n_root(degree: int, q: int) -> int:
    """psi = g^((q-1)/2N) with psi^N == -1 mod q, in the reference's search
    order (ntt_processor.cpp:110-126) but with primality validation and a
    bounded search — the reference's O(q) loop never terminates on its own
    (composite) TFHE preset moduli; see ops/primes.py."""
    from .primes import find_generator_2n

    return find_generator_2n(degree, q)


def _bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


# ---------------------------------------------------------------------------
# NTT context
# ---------------------------------------------------------------------------


class NTTContext:
    """Precomputed twiddle tables + jit-friendly forward/inverse transforms.

    Equivalent of `NTTProcessor` + `TwiddleFactors`
    (cpp/include/ntt_processor.h:29-303) with the correctness fix described in
    the module docstring.  All transforms operate on limb-plane pairs of shape
    (..., N) and are pure jnp — call sites wrap them in `jax.jit`.
    """

    def __init__(self, degree: int, q: int, psi: int | None = None):
        if degree & (degree - 1) or degree < 4:
            raise ValueError("degree must be a power of two >= 4")
        self.n = degree
        self.logn = degree.bit_length() - 1
        self.q = q
        self.ctx = ModCtx(q)
        self.psi = psi if psi is not None else find_primitive_2n_root(degree, q)
        self.psi_inv = pow(self.psi, -1, q)
        self.n_inv = pow(degree, -1, q)

        # Longa-Naehrig tables: psis[j] = psi^bitrev(j), ipsis[j] = psi^-bitrev(j)
        n, logn = self.n, self.logn
        psis = np.empty(n, dtype=np.uint64)
        ipsis = np.empty(n, dtype=np.uint64)
        for j in range(n):
            br = _bit_reverse(j, logn)
            psis[j] = pow(self.psi, br, q)
            ipsis[j] = pow(self.psi_inv, br, q)

        # Per-stage twiddle slices, shaped (m, 1) for broadcast over t.
        # Forward stage s: m = 2^s groups, twiddles psis[m : 2m].
        self._fwd_tw = []
        self._inv_tw = []
        for s in range(logn):
            m = 1 << s
            self._fwd_tw.append(self._prep_const(psis[m: 2 * m].reshape(m, 1)))
        # Inverse stage s (t = 2^s): m = n >> (s+1) groups, twiddles ipsis[m : 2m].
        for s in range(logn):
            m = n >> (s + 1)
            self._inv_tw.append(self._prep_const(ipsis[m: 2 * m].reshape(m, 1)))
        self._n_inv_c = self._prep_const(np.array([self.n_inv], dtype=np.uint64))

    # -- constant preparation ------------------------------------------------
    def _prep_const(self, arr: np.ndarray):
        """Prepare a constant multiplier for `_mul_const`.

        Twiddles are stored as w*R mod q so one Montgomery pass computes
        a*w mod q exactly: mont_mul(a, w*R) = a*w.  This beats even the
        Solinas shift/add chains for the hot butterfly muls (~60 vs ~110
        VPU ops for 40-bit Solinas moduli), and works for any odd q.
        """
        ctx = self.ctx
        scaled = (arr.astype(object) * ctx.r_mod_q % ctx.q).astype(np.uint64)
        return u64_from_np(scaled)

    def _mul_const(self, a, w_prep):
        return self.ctx.mont_mul(a, w_prep)

    # -- transforms ----------------------------------------------------------
    def forward(self, a):
        """Negacyclic forward NTT: (..., N) natural order -> bit-reversed.

        log2(N) CT stages; stage s reshapes to (..., m, 2, t) with m = 2^s,
        t = N/2m and applies  (U, V) -> (U + w V, U - w V)  with per-group
        twiddle w = psi^bitrev(m+i).
        """
        ctx = self.ctx
        n = self.n
        lo, hi = a
        batch = lo.shape[:-1]
        for s in range(self.logn):
            m = 1 << s
            t = n >> (s + 1)
            shp = batch + (m, 2, t)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            u = (lo_r[..., 0, :], hi_r[..., 0, :])
            v = (lo_r[..., 1, :], hi_r[..., 1, :])
            wv = self._mul_const(v, self._fwd_tw[s])
            top = ctx.add(u, wv)
            bot = ctx.sub(u, wv)
            lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (n,))
            hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (n,))
        return (lo, hi)

    def inverse(self, a):
        """Negacyclic inverse NTT: bit-reversed -> natural order, scaled N^-1.

        GS stages: (U, V) -> (U + V, (U - V) w) with w = psi^-bitrev(m+i).
        """
        ctx = self.ctx
        n = self.n
        lo, hi = a
        batch = lo.shape[:-1]
        for s in range(self.logn):
            t = 1 << s
            m = n >> (s + 1)
            shp = batch + (m, 2, t)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            u = (lo_r[..., 0, :], hi_r[..., 0, :])
            v = (lo_r[..., 1, :], hi_r[..., 1, :])
            top = ctx.add(u, v)
            diff = ctx.sub(u, v)
            bot = self._mul_const(diff, self._inv_tw[s])
            lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (n,))
            hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (n,))
        return self._mul_const((lo, hi), self._n_inv_c)

    def pointwise_mul(self, a, b):
        """Elementwise product in the NTT domain (polynomial_ring.cpp:493)."""
        return self.ctx.mul(a, b)

    def negacyclic_mul(self, a, b):
        """a * b mod (X^N + 1, q), both in coefficient form."""
        fa = self.forward(a)
        fb = self.forward(b)
        return self.inverse(self.ctx.mul(fa, fb))

    # -- host conversions ----------------------------------------------------
    def to_planes(self, coeffs) -> tuple:
        return u64_from_np(np.asarray(coeffs, dtype=np.uint64))

    def to_np(self, planes) -> np.ndarray:
        return u64_to_np(planes)


# ---------------------------------------------------------------------------
# Host oracle
# ---------------------------------------------------------------------------


def negacyclic_mul_np(a, b, q: int) -> np.ndarray:
    """Exact host oracle for a*b mod (X^N+1, q) via Kronecker substitution.

    Packs each polynomial into one big integer with base-2^B digit slots
    (B wide enough that column sums never overflow a slot), multiplies once
    with Python big-int arithmetic, then unpacks and applies the negacyclic
    wrap c[k] - c[k+N].
    """
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    n = len(a)
    # Column sums bounded by N * (q-1)^2 < 2^(2*qbits + logN); pad a few bits.
    slot = 2 * q.bit_length() + n.bit_length() + 2
    pack_a = sum(c << (slot * i) for i, c in enumerate(a))
    pack_b = sum(c << (slot * i) for i, c in enumerate(b))
    prod = pack_a * pack_b
    mask = (1 << slot) - 1
    cols = [(prod >> (slot * i)) & mask for i in range(2 * n)]
    return np.array(
        [(cols[k] - cols[k + n]) % q for k in range(n)], dtype=np.uint64
    )
