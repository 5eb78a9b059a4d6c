"""Distributed negacyclic NTT: 4-step decomposition with all-to-all.

The TPU answer to SURVEY.md §5.7/§5.8: the reference scales its NTT with
per-stage GPU threads on one chip (ntt_forward.metal:33-93); across a TPU
mesh the polynomial's coefficient axis is sharded and the transform runs as

    twist (psi^j, local)  ->  local N1-point NTTs along the unsharded axis
    -> twiddle multiply (local) -> ALL-TO-ALL transpose over ICI
    -> local N2-point NTTs

i.e. the classic Bailey/4-step factorization where the single collective is
the sequence-parallel all-to-all (SURVEY.md's ring-attention analog).

The local sub-transforms use the matrix form (cyclic DFT as a modular
matmul, the reference's MatrixNTT idea, matrix_ntt.cpp:346) — u64 products
accumulated in u128 lanes with ONE modular reduction per output element.
Correctness oracle: the single-chip negacyclic NTT (ops/ntt.py) up to the
4-step's (k1, k2) output ordering.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.modular import ModCtx
from ..ops.ntt import find_primitive_2n_root
from ..ops.u64 import (
    u64_from_np, u64_mul_wide, u128_add, U32,
)

__all__ = ["DistNTT", "CyclicNTT", "matrix_cyclic_ntt"]


def _bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


class CyclicNTT:
    """Log-stage cyclic DFT of power-of-two size m over Z_q.

    Forward = Gentleman-Sande DIF (natural in -> BIT-REVERSED out);
    inverse = Cooley-Tukey DIT (bit-reversed in -> natural out, m^-1
    scaled) — the pairing absorbs the bit-reversal permutation entirely,
    exactly like the negacyclic NTTContext (ops/ntt.py).  This is the local
    sub-transform of the 4-step distributed NTT: O(m log m) fused VPU
    sweeps instead of the O(m^2) matrix form.

    Operates along the LAST axis of limb-plane pairs.
    """

    def __init__(self, m: int, q: int, omega: int):
        if m & (m - 1):
            raise ValueError("m must be a power of two")
        if pow(omega, m, q) != 1 or (m > 1 and pow(omega, m // 2, q) == 1):
            raise ValueError("omega must have exact order m")
        self.m = m
        self.logm = m.bit_length() - 1
        self.q = q
        self.ctx = ModCtx(q)
        self.omega = omega
        omega_inv = pow(omega, -1, q)
        self.m_inv = pow(m, -1, q)
        # GS-DIF stage s (s = 0 .. logm-1): half = m >> (s+1); twiddles
        # omega^(j * 2^s) for j in [0, half).  DIT inverse runs stages in
        # the opposite order with conjugate twiddles.
        self._fwd_tw = []
        self._inv_tw = []
        for s in range(self.logm):
            half = m >> (s + 1)
            tw = np.array([pow(omega, (j << s), q) for j in range(half)],
                          dtype=np.uint64)
            itw = np.array([pow(omega_inv, (j << s), q) for j in range(half)],
                           dtype=np.uint64)
            self._fwd_tw.append(self._prep(tw.reshape(1, half)))
            self._inv_tw.append(self._prep(itw.reshape(1, half)))
        self._m_inv_c = self._prep(np.array([self.m_inv], dtype=np.uint64))

    def _prep(self, arr):
        """Montgomery-scaled constant (one mont_mul = exact modmul)."""
        scaled = (arr.astype(object) * self.ctx.r_mod_q % self.q
                  ).astype(np.uint64)
        return u64_from_np(scaled)

    def _mulc(self, a, w):
        return self.ctx.mont_mul(a, w)

    def forward(self, a):
        """(..., m) natural order -> (..., m) bit-reversed order."""
        ctx = self.ctx
        m = self.m
        lo, hi = a
        batch = lo.shape[:-1]
        for s in range(self.logm):
            groups = 1 << s
            half = m >> (s + 1)
            shp = batch + (groups, 2, half)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            u = (lo_r[..., 0, :], hi_r[..., 0, :])
            v = (lo_r[..., 1, :], hi_r[..., 1, :])
            top = ctx.add(u, v)
            bot = self._mulc(ctx.sub(u, v), self._fwd_tw[s])
            lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (m,))
            hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (m,))
        return (lo, hi)

    def inverse(self, a):
        """(..., m) bit-reversed order -> (..., m) natural, m^-1 scaled."""
        ctx = self.ctx
        m = self.m
        lo, hi = a
        batch = lo.shape[:-1]
        for s in range(self.logm - 1, -1, -1):
            groups = 1 << s
            half = m >> (s + 1)
            shp = batch + (groups, 2, half)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            u = (lo_r[..., 0, :], hi_r[..., 0, :])
            wv = self._mulc((lo_r[..., 1, :], hi_r[..., 1, :]),
                            self._inv_tw[s])
            top = ctx.add(u, wv)
            bot = ctx.sub(u, wv)
            lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (m,))
            hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (m,))
        return self._mulc((lo, hi), self._m_inv_c)


def _mat_mod_mul(ctx: ModCtx, w_planes, a_planes):
    """C = W @ A mod q on limb planes: W (M, M), A (M, ...); accumulate the
    u128 column sums, reduce once per output."""
    M = w_planes[0].shape[0]
    acc = None
    for k in range(M):
        ak = (a_planes[0][k], a_planes[1][k])            # (...,)
        wshape = (M,) + (1,) * ak[0].ndim
        wk = (w_planes[0][:, k].reshape(wshape),
              w_planes[1][:, k].reshape(wshape))
        prod = u64_mul_wide(wk, (ak[0][None], ak[1][None]))  # (M, ...)
        acc = prod if acc is None else u128_add(acc, prod)
    return ctx.reduce_128(acc)


def matrix_cyclic_ntt(ctx: ModCtx, omega: int, m: int, a_planes,
                      inverse: bool = False):
    """Cyclic DFT of size m along axis 0 via the W matrix (MatrixNTT)."""
    q = ctx.q
    w = pow(omega, -1, q) if inverse else omega
    W = np.empty((m, m), dtype=np.uint64)
    for i in range(m):
        for j in range(m):
            W[i, j] = pow(w, i * j, q)
    if inverse:
        m_inv = pow(m, -1, q)
        W = (W.astype(object) * m_inv % q).astype(np.uint64)
    return _mat_mod_mul(ctx, u64_from_np(W), a_planes)


class DistNTT:
    """Sharded negacyclic NTT over a mesh axis.

    N = n1 * n2; coefficients arrive as (..., N) with the last axis to be
    sharded over `axis_name` in n2-sized column blocks.  `forward_local`
    is the shard_map-able body; `reference_forward` computes the identical
    result single-chip for equivalence tests.
    """

    def __init__(self, degree: int, q: int, n1: int, axis_name: str = "data"):
        if degree % n1:
            raise ValueError("n1 must divide N")
        self.n = degree
        self.n1 = n1
        self.n2 = degree // n1
        self.q = q
        self.ctx = ModCtx(q)
        self.axis_name = axis_name
        self.psi = find_primitive_2n_root(degree, q)
        self.omega = self.psi * self.psi % q
        self.w1 = pow(self.omega, self.n2, q)   # order n1
        self.w2 = pow(self.omega, self.n1, q)   # order n2

        # host tables
        n = degree
        self.twist = np.array([pow(self.psi, j, q) for j in range(n)],
                              dtype=np.uint64)
        # inter-step twiddles: omega^(k1*j2), shape (n1, n2)
        tw = np.empty((n1, self.n2), dtype=np.uint64)
        for k1 in range(n1):
            for j2 in range(self.n2):
                tw[k1, j2] = pow(self.omega, k1 * j2, q)
        self.step_tw = tw

        # ---- log-stage local transforms (production path) ----
        self.c1 = CyclicNTT(n1, q, self.w1)
        self.c2 = CyclicNTT(self.n2, q, self.w2)
        logn1 = n1.bit_length() - 1
        omega_inv = pow(self.omega, -1, q)
        psi_inv = pow(self.psi, -1, q)
        # step twiddles with k1 rows in the local transform's BITREV order
        twb = np.empty((n1, self.n2), dtype=np.uint64)
        twb_inv = np.empty((n1, self.n2), dtype=np.uint64)
        for pos in range(n1):
            k1 = _bit_reverse(pos, logn1)
            for j2 in range(self.n2):
                twb[pos, j2] = pow(self.omega, k1 * j2, q)
                twb_inv[pos, j2] = pow(omega_inv, k1 * j2, q)
        self.step_tw_brv = twb
        self.step_tw_brv_inv = twb_inv
        self.untwist = np.array(
            [pow(psi_inv, j, q) for j in range(degree)], dtype=np.uint64)

    # -- single-chip reference ----------------------------------------------
    def reference_forward(self, a_np: np.ndarray) -> np.ndarray:
        """Host oracle: X[k2*n1+k1] = sum_j twist_j a_j omega^(k j) with the
        4-step output ordering."""
        q = self.q
        n = self.n
        at = [int(x) * int(t) % q for x, t in zip(a_np, self.twist)]
        out = np.empty(n, dtype=np.uint64)
        for k in range(n):
            k1, k2 = k % self.n1, k // self.n1
            s = 0
            for j in range(n):
                s = (s + at[j] * pow(self.omega, (k1 + self.n1 * k2) * j, q)) % q
            out[k] = s
        return out

    # -- device implementation ----------------------------------------------
    def forward_4step(self, planes):
        """Single-device 4-step forward (used under shard_map per shard and
        as the full-array fallback): (..., N) -> (..., N) with (k1 + n1*k2)
        ordering."""
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        lo, hi = planes
        batch = lo.shape[:-1]

        # twist
        tpl = u64_from_np(self.twist)
        x = ctx.mul((lo, hi), tpl)
        # reshape to (j1, j2): row-major j = j1*n2 + j2
        x = (x[0].reshape(batch + (n1, n2)), x[1].reshape(batch + (n1, n2)))
        # N1-point NTTs along j1 (axis -2): move to axis 0 for the matmul
        xm = (jnp.moveaxis(x[0], -2, 0), jnp.moveaxis(x[1], -2, 0))
        y = matrix_cyclic_ntt(ctx, self.w1, n1, xm)          # (n1=k1, ..., n2)
        # twiddle omega^(k1 j2)
        twp = u64_from_np(self.step_tw)
        tw_shaped = (twp[0].reshape((n1,) + (1,) * len(batch) + (n2,)),
                     twp[1].reshape((n1,) + (1,) * len(batch) + (n2,)))
        y = ctx.mul(y, tw_shaped)
        # N2-point NTTs along j2 (last axis): move to axis 0
        ym = (jnp.moveaxis(y[0], -1, 0), jnp.moveaxis(y[1], -1, 0))
        z = matrix_cyclic_ntt(ctx, self.w2, n2, ym)          # (k2, n1=k1, ...)
        # output ordering: X[k2*n1 + k1] -> axes (..., k2, k1) flattened
        z0 = jnp.moveaxis(z[0], (0, 1), (-2, -1))            # (..., k2, k1)
        z1 = jnp.moveaxis(z[1], (0, 1), (-2, -1))
        return (z0.reshape(batch + (self.n,)), z1.reshape(batch + (self.n,)))

    def forward_sharded(self, local_planes):
        """shard_map body: local shard (..., n1, n2/P) of the (j1, j2) grid
        (sharded over j2); returns local shard (..., n2, n1/P) of the
        (k2, k1) output grid (sharded over k1) after one all-to-all."""
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        ax = self.axis_name
        P = lax.axis_size(ax)
        idx = lax.axis_index(ax)
        lo, hi = local_planes                    # (..., n1, n2/P)
        cols = n2 // P

        # twist: psi^(j1*n2 + j2), local slice of columns
        j1 = np.arange(n1)[:, None]
        j2g = np.arange(cols)[None, :]
        # local j2 = idx*cols + j2g  (traced) -> build via power tables:
        # psi^(j1*n2) * psi^(idx*cols + j2g)
        psi_rows = u64_from_np(np.array(
            [pow(self.psi, int(r) * n2, self.q) for r in range(n1)],
            dtype=np.uint64))
        psi_cols_all = u64_from_np(np.array(
            [pow(self.psi, c, self.q) for c in range(n2)],
            dtype=np.uint64))
        col_lo = lax.dynamic_slice_in_dim(psi_cols_all[0], idx * cols, cols)
        col_hi = lax.dynamic_slice_in_dim(psi_cols_all[1], idx * cols, cols)
        tw_local = ctx.mul((psi_rows[0][:, None], psi_rows[1][:, None]),
                           (col_lo[None, :], col_hi[None, :]))
        x = ctx.mul((lo, hi), tw_local)

        # local N1 NTT along j1
        xm = (jnp.moveaxis(x[0], -2, 0), jnp.moveaxis(x[1], -2, 0))
        y = matrix_cyclic_ntt(ctx, self.w1, n1, xm)   # (k1, ..., cols)
        y = (jnp.moveaxis(y[0], 0, -2), jnp.moveaxis(y[1], 0, -2))

        # step twiddles omega^(k1 * j2_local)
        tw_all = u64_from_np(self.step_tw)            # (n1, n2)
        st_lo = lax.dynamic_slice_in_dim(tw_all[0], idx * cols, cols, axis=1)
        st_hi = lax.dynamic_slice_in_dim(tw_all[1], idx * cols, cols, axis=1)
        y = ctx.mul(y, (st_lo, st_hi))

        # ALL-TO-ALL: reshard from j2-sharded to k1-sharded.
        # y: (..., n1, cols); split k1 into P blocks of n1/P and exchange.
        rows = n1 // P
        y0 = y[0].reshape(y[0].shape[:-2] + (P, rows, cols))
        y1 = y[1].reshape(y[1].shape[:-2] + (P, rows, cols))
        g0 = lax.all_to_all(y0, ax, split_axis=y0.ndim - 3,
                            concat_axis=y0.ndim - 1, tiled=False)
        g1 = lax.all_to_all(y1, ax, split_axis=y1.ndim - 3,
                            concat_axis=y1.ndim - 1, tiled=False)
        # g: (..., rows, cols, P) with source device s holding j2 block s;
        # reorder to (..., rows, P, cols) and flatten -> full j2 axis
        g0 = jnp.moveaxis(g0, -1, -2)
        g0 = g0.reshape(g0.shape[:-3] + (rows, P * cols))
        g1 = jnp.moveaxis(g1, -1, -2)
        g1 = g1.reshape(g1.shape[:-3] + (rows, P * cols))
        # g: (..., rows, n2) = (..., n1/P rows of k1, all n2 columns)
        # local N2 NTT along j2 (now complete): axis -1
        gm = (jnp.moveaxis(g0, -1, 0), jnp.moveaxis(g1, -1, 0))
        z = matrix_cyclic_ntt(ctx, self.w2, n2, gm)   # (k2, ..., rows)
        z = (jnp.moveaxis(z[0], 0, -2), jnp.moveaxis(z[1], 0, -2))
        # local output: (..., k2=n2, k1_local=rows)
        return z

    # ------------------------------------------------------------------
    # Production path: log-stage locals, full round trip, negacyclic mul
    # ------------------------------------------------------------------
    # Transform-domain layout ("dist-NTT order"): local shard of shape
    # (..., n2, n1/P) holding positions (k2_pos, k1_pos) of the BITREV-
    # ordered (k2, k1) grid; device d owns k1 positions [d*rows, (d+1)*rows).
    # The ordering is internal: pointwise ops are elementwise and
    # inverse_sharded undoes it exactly.

    def _twist_local(self, planes, idx, inverse: bool = False):
        """Multiply local (..., n1, cols) columns by psi^(j1*n2 + j2) (or
        its inverse), j2 = idx*cols + local column."""
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        cols = planes[0].shape[-1]
        # psi^(j1*n2) per row and psi^(j2) per column (or inverses)
        base = pow(self.psi, -1, self.q) if inverse else self.psi
        row_tab = u64_from_np(np.array(
            [pow(base, r * n2, self.q) for r in range(n1)], dtype=np.uint64))
        col_tab = u64_from_np(np.array(
            [pow(base, c, self.q) for c in range(n2)], dtype=np.uint64))
        col_lo = lax.dynamic_slice_in_dim(col_tab[0], idx * cols, cols)
        col_hi = lax.dynamic_slice_in_dim(col_tab[1], idx * cols, cols)
        tw = ctx.mul((row_tab[0][:, None], row_tab[1][:, None]),
                     (col_lo[None, :], col_hi[None, :]))
        return ctx.mul(planes, tw)

    def forward_local(self, local_planes):
        """shard_map body, production path.  In: (..., n1, n2/P) shard of
        the (j1, j2) coefficient grid (j2 sharded).  Out: dist-NTT-order
        shard (..., n2, n1/P).  One all-to-all on `axis_name`."""
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        ax = self.axis_name
        P = lax.axis_size(ax)
        idx = lax.axis_index(ax)
        cols = local_planes[0].shape[-1]
        rows = n1 // P

        x = self._twist_local(local_planes, idx)
        # local N1 DFT along j1 (axis -2) -> k1 positions (bitrev order)
        xm = (jnp.moveaxis(x[0], -2, -1), jnp.moveaxis(x[1], -2, -1))
        y = self.c1.forward(xm)                       # (..., cols, n1)
        y = (jnp.moveaxis(y[0], -1, -2), jnp.moveaxis(y[1], -1, -2))
        # step twiddles omega^(k1 * j2), k1 in bitrev row order
        st = u64_from_np(self.step_tw_brv)
        st_lo = lax.dynamic_slice_in_dim(st[0], idx * cols, cols, axis=1)
        st_hi = lax.dynamic_slice_in_dim(st[1], idx * cols, cols, axis=1)
        y = ctx.mul(y, (st_lo, st_hi))
        # all-to-all: j2-sharded -> k1-sharded
        y0 = y[0].reshape(y[0].shape[:-2] + (P, rows, cols))
        y1 = y[1].reshape(y[1].shape[:-2] + (P, rows, cols))
        g0 = lax.all_to_all(y0, ax, split_axis=y0.ndim - 3,
                            concat_axis=y0.ndim - 1, tiled=False)
        g1 = lax.all_to_all(y1, ax, split_axis=y1.ndim - 3,
                            concat_axis=y1.ndim - 1, tiled=False)
        g0 = jnp.moveaxis(g0, -1, -2)
        g0 = g0.reshape(g0.shape[:-3] + (rows, P * cols))
        g1 = jnp.moveaxis(g1, -1, -2)
        g1 = g1.reshape(g1.shape[:-3] + (rows, P * cols))
        # local N2 DFT along j2 (full axis) -> k2 positions (bitrev order)
        z = self.c2.forward((g0, g1))                 # (..., rows, n2)
        return (jnp.moveaxis(z[0], -1, -2), jnp.moveaxis(z[1], -1, -2))

    def inverse_local(self, z_local):
        """shard_map body: exact inverse of forward_local.
        In: dist-NTT-order shard (..., n2, n1/P); out: coefficient shard
        (..., n1, n2/P)."""
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        ax = self.axis_name
        P = lax.axis_size(ax)
        idx = lax.axis_index(ax)
        rows = n1 // P
        cols = n2 // P

        # inverse N2 along k2 (axis -2): bitrev -> natural j2, n2^-1 scaled
        zm = (jnp.moveaxis(z_local[0], -2, -1),
              jnp.moveaxis(z_local[1], -2, -1))      # (..., rows, n2)
        y = self.c2.inverse(zm)
        # divide out step twiddles: omega^(-k1*j2), k1 local rows
        st = u64_from_np(self.step_tw_brv_inv)
        st_lo = lax.dynamic_slice_in_dim(st[0], idx * rows, rows, axis=0)
        st_hi = lax.dynamic_slice_in_dim(st[1], idx * rows, rows, axis=0)
        y = ctx.mul(y, (st_lo, st_hi))
        # all-to-all back: k1-sharded -> j2-sharded
        y0 = y[0].reshape(y[0].shape[:-1] + (P, cols))      # (..., rows, P, cols)
        y1 = y[1].reshape(y[1].shape[:-1] + (P, cols))
        g0 = lax.all_to_all(y0, ax, split_axis=y0.ndim - 2,
                            concat_axis=y0.ndim - 3, tiled=False)
        g1 = lax.all_to_all(y1, ax, split_axis=y1.ndim - 2,
                            concat_axis=y1.ndim - 3, tiled=False)
        # g: (..., P(src k1 block), rows, cols) -> full k1 axis
        g0 = g0.reshape(g0.shape[:-3] + (n1, cols))
        g1 = g1.reshape(g1.shape[:-3] + (n1, cols))
        # inverse N1 along k1 (axis -2): bitrev -> natural j1, n1^-1 scaled
        gm = (jnp.moveaxis(g0, -2, -1), jnp.moveaxis(g1, -2, -1))
        x = self.c1.inverse(gm)
        x = (jnp.moveaxis(x[0], -1, -2), jnp.moveaxis(x[1], -1, -2))
        # un-twist (total scaling n1^-1 * n2^-1 = N^-1 already applied)
        return self._twist_local(x, idx, inverse=True)

    def pointwise_local(self, a, b):
        """Elementwise product in the dist-NTT domain (any matching
        layout)."""
        return self.ctx.mul(a, b)

    def negacyclic_mul_local(self, a, b):
        """shard_map body: full distributed negacyclic multiply.
        a, b: coefficient shards (..., n1, n2/P)."""
        fa = self.forward_local(a)
        fb = self.forward_local(b)
        return self.inverse_local(self.pointwise_local(fa, fb))
