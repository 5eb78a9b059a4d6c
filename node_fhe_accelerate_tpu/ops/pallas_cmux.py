"""Fused Pallas TPU kernel for one TFHE blind-rotate step (CMux).

One `pallas_call` per scan step computes, entirely in VMEM per batch tile:

    rotated = X^rot * acc          (negacyclic binary-ladder rotation)
    diff    = rotated - acc        (torus subtraction, free mod 2^32)
    digits  = gadget_decompose(diff)            (balanced signed int8)
    prod    = digits x Toeplitz(g~)             (int8 MXU dots)
    acc'    = acc + recombine_planes(prod)      (CMux accumulate)

vs the XLA path (core/bootstrap.py external_product_mxu), which

* materializes the FULL (lvl, j, jp, P, N, N) int8 Toeplitz expansion in
  HBM every step (~32 MB written + read at the production shape), and
* round-trips acc/rotated/digits/partial-products through HBM between
  the rotate / decompose / dot / recombine kernels (~190 MB/step extra).

The negacyclic Toeplitz T[c, r] = g~[(r - c) mod 2N] is BLOCK-TOEPLITZ in
128x128 tiles: block (rt, ct) depends only on the diagonal d = rt - ct, so
per (lvl, j, jp, plane) there are only 2*N/128 - 1 DISTINCT blocks, not
(N/128)^2.  `build_diag_tiles` materializes exactly those diagonal blocks
once per step in XLA (7.5 MB at the production shape — 4x less than the
full expansion, 2N/128 = 16x less redundancy) and the kernel is then pure
int8 MXU dots over static tile indices: block-row rt accumulates
digits[ct] @ tile[rt - ct].  An earlier revision rebuilt every tile inside
the kernel by roll-doubling; that redid the doubling per batch-grid tile
(~GB/step of VPU shuffle at batch 4096), dominating the MXU dots.

Bit-exactness: every op is the same exact integer algebra as the XLA
backends — asserted against external_product_mxu in
tests/test_pallas_cmux.py (interpret mode on CPU; compiled on TPU).

This backend is opt-in (`TfheEngine(..., ext_backend="pallas")`) until
profiled on hardware.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cmux_step_pallas", "cmux_step_tiles", "build_diag_tiles",
           "build_all_step_tiles", "blind_rotate_fused",
           "build_all_step_slabs", "blind_rotate_fused_steps"]


def _rotate_neg(x, rot, n: int, logn: int):
    """X^rot * x over the last axis (same ladder as TorusRing.rotate)."""
    r = rot % (2 * n)                                  # (Bt, 1) int32
    out = x
    for i in range(logn + 1):
        s = 1 << i
        bit = ((r >> i) & 1) == 1                      # (Bt, 1)
        if s < n:
            head = jnp.uint32(0) - out[..., -s:]
            rolled = jnp.concatenate([head, out[..., :-s]], axis=-1)
        else:                                          # X^n = -1
            rolled = jnp.uint32(0) - out
        out = jnp.where(bit[..., None], rolled, out)
    return out


def _decompose(a, base_log: int, level: int):
    """Balanced signed digits of the top level*base_log bits
    (TorusRing.decompose, torus.py:103-127) — returns int8 (level,)+shape."""
    b = base_log
    total = level * b
    half = jnp.uint32(1 << (b - 1))
    rounding = jnp.uint32(1 << (32 - total - 1)) if total < 32 \
        else jnp.uint32(0)
    y = (a + rounding) >> (32 - total)
    digits = []
    carry = jnp.zeros_like(a)
    for _ in range(level):
        d = (y & jnp.uint32((1 << b) - 1)) + carry
        y = y >> b
        over = d >= half
        carry = jnp.where(over, jnp.uint32(1), jnp.uint32(0))
        d_signed = jnp.where(over, d.astype(jnp.int32) - (1 << b),
                             d.astype(jnp.int32))
        digits.append(d_signed.astype(jnp.int8))
    digits.reverse()
    return digits                                       # [lvl] of a.shape i8


def build_diag_tiles(ghat2):
    """Distinct diagonal Toeplitz blocks of one GGSW row (XLA, per step).

    ghat2: int8 (lvl, k+1, k+1, P, 4N), 2N-periodic digit planes of
    [g, -g] (doubled so no slice wraps).  Returns int8
    (lvl, k+1, k+1, P, 2*nt-1, 128, 128) with, for d = rt - ct
    (diagonal index di = d + nt - 1),

        tiles[..., di, c, r] = ghat2[..., (128*d + r - c) mod 2N]
                             = T[128*ct + c, 128*rt + r].

    Built by the log-doubling identity on a 256-wide window per diagonal:
    strip rows [m, 2m) are rows [0, m) rolled right by m.
    """
    four_n = ghat2.shape[-1]
    two_n = four_n // 2
    n = two_n // 2
    nt = n // 128
    starts = [(128 * d - 127) % two_n for d in range(-(nt - 1), nt)]
    w = jnp.stack([jax.lax.dynamic_slice_in_dim(ghat2, s, 256, axis=-1)
                   for s in starts], axis=-2)           # (..., D, 256)
    s = w[..., None, :]                                 # (..., D, 1, 256)
    m = 1
    while m < 128:
        s = jnp.concatenate([s, jnp.roll(s, m, axis=-1)], axis=-2)
        m *= 2
    # S[c, jj] = w[jj - c] (jj < c is wraparound garbage, never read:
    # the tile region jj in [127, 255) has jj >= c for all c <= 127)
    return s[..., 127:255]                              # (..., D, 128, 128)


def build_diag_slabs(ghat2):
    """Diagonal blocks in matmul-slab layout for the fused kernel.

    Returns int8 (D, lvl*(k+1)*128, (k+1)*P*128): slab di is the weight
    matrix W with W[(l, j, c), (jp, p, r)] = tiles[l, j, jp, p, di, c, r],
    so block-row rt of the external product is

        out[bt, (jp, p, 128rt + r)] = sum_ct  X_ct @ W[rt - ct + nt - 1]

    with X_ct = digits arranged (bt, (l, j, c)) at coefficient block ct.
    Collapsing (l, j, c) into one K=lvl*(k+1)*128 contraction and
    (jp, p, r) into one wide output axis turns the kernel's 2048 little
    (bt,128)x(128,128) dots per batch tile into nt^2 = 64 MXU-shaped
    (bt, K)x(K, (k+1)*P*128) dots — same bytes (~7.9 MB at production
    shape), same exact int8/int32 algebra.
    """
    lvl, kp1, _, planes, _ = ghat2.shape
    tiles = build_diag_tiles(ghat2)    # (lvl, j, jp, P, D, c, r)
    d = tiles.shape[-3]
    slabs = jnp.transpose(tiles, (4, 0, 1, 5, 2, 3, 6))  # (D,l,j,c,jp,P,r)
    return slabs.reshape(d, lvl * kp1 * 128, kp1 * planes * 128)


def _cmux_kernel_v1(acc_ref, rot_ref, tiles_ref, out_ref, *,
                    n: int, logn: int, k: int, lvl: int, planes: int,
                    base_log: int):
    """DEFAULT variant: 128x128-tile dots (2048 issues/grid-tile at the
    production shape).  Measured FASTEST on v5e (3603 bootstraps/s at
    batch 4096, block_b=64 — benchmark_results/ab_pallas_v5e.jsonl); the
    big-slab v2 below measured 3093/s in its transposed-X form and its
    slice-concat form fails Mosaic remote compilation (HTTP 500,
    2026-08-19), so v1 stays the default."""
    acc = acc_ref[:]                                   # (Bt, k+1, N) u32
    rot = rot_ref[:]                                   # (Bt, 1) i32
    rotated = _rotate_neg(acc, rot, n, logn)
    diff = rotated - acc
    digits = _decompose(diff, base_log, lvl)           # [lvl](Bt, k+1, N) i8

    nt = n // 128
    bt = acc.shape[0]
    for jp in range(k + 1):
        res = jnp.zeros((bt, n), jnp.uint32)
        for p in range(planes):
            blocks = []
            for rt in range(nt):
                a32 = jnp.zeros((bt, 128), jnp.int32)
                for l in range(lvl):
                    for j in range(k + 1):
                        d_lj = digits[l][:, j, :]              # (Bt, N) i8
                        for ct in range(nt):
                            di = rt - ct + nt - 1
                            tile = tiles_ref[l, j, jp, p, di]  # (128, 128)
                            x = d_lj[:, ct * 128:(ct + 1) * 128]
                            a32 = a32 + jax.lax.dot_general(
                                x, tile, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                blocks.append(a32)
            acc32 = jnp.concatenate(blocks, axis=-1)           # (Bt, N)
            res = res + (acc32.astype(jnp.uint32) << jnp.uint32(8 * p))
        out_ref[:, jp, :] = acc[:, jp, :] + res


def _cmux_kernel_v3(acc_ref, rot_ref, slabs_ref, out_ref, *,
                    n: int, logn: int, k: int, lvl: int, planes: int,
                    base_log: int):
    """Wide-slab variant: per-(l, j, ct) int8 dots of shape
    (bt, 128) x (128, (k+1)*P*128) against the (D, K, wide) diagonal
    slabs — 8x fewer, 8x wider MXU issues than v1's 128-wide tiles, and
    no lane-concat of digit slices (which v2 needed and Mosaic cannot
    lower: 'offset mismatch on non-concat dimension')."""
    acc = acc_ref[:]                                   # (Bt, k+1, N) u32
    rot = rot_ref[:]                                   # (Bt, 1) i32
    rotated = _rotate_neg(acc, rot, n, logn)
    diff = rotated - acc
    digits = _decompose(diff, base_log, lvl)           # [lvl](Bt, k+1, N) i8

    nt = n // 128
    bt = acc.shape[0]
    kp1 = k + 1
    wide = kp1 * planes * 128
    a32 = [jnp.zeros((bt, wide), jnp.int32) for _ in range(nt)]
    for l in range(lvl):
        for j in range(kp1):
            d_lj = digits[l][:, j, :]
            row0 = (l * kp1 + j) * 128
            for ct in range(nt):
                x = d_lj[:, ct * 128:(ct + 1) * 128]
                for rt in range(nt):
                    di = rt - ct + nt - 1
                    w = slabs_ref[di, row0:row0 + 128, :]
                    a32[rt] = a32[rt] + jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    # a32[rt] columns are (jp, p, r); recombine planes mod 2^32
    res = []
    for rt in range(nt):
        blk = a32[rt].reshape(bt, kp1, planes, 128)
        acc_p = blk[:, :, 0, :].astype(jnp.uint32)
        for p in range(1, planes):
            acc_p = acc_p + (blk[:, :, p, :].astype(jnp.uint32)
                             << jnp.uint32(8 * p))
        res.append(acc_p)                              # (bt, k+1, 128)
    out_ref[:] = acc + jnp.concatenate(res, axis=-1)


def _cmux_kernel(acc_ref, rot_ref, slabs_ref, out_ref, *,
                 n: int, logn: int, k: int, lvl: int, planes: int,
                 base_log: int):
    acc = acc_ref[:]                                   # (Bt, k+1, N) u32
    rot = rot_ref[:]                                   # (Bt, 1) i32
    rotated = _rotate_neg(acc, rot, n, logn)
    diff = rotated - acc
    digits = _decompose(diff, base_log, lvl)           # [lvl](Bt, k+1, N) i8

    nt = n // 128
    bt = acc.shape[0]
    kp1 = k + 1
    # X_ct[bt, (l, j, c)] — contraction layout matching build_diag_slabs,
    # built by lane-aligned slice+concat (no int8 sublane transpose).
    xs = [jnp.concatenate(
        [digits[l][:, j, ct * 128:(ct + 1) * 128]
         for l in range(lvl) for j in range(kp1)], axis=-1)
        for ct in range(nt)]                           # nt of (Bt, K)

    wide = kp1 * planes * 128
    blocks = []
    for rt in range(nt):
        a32 = jnp.zeros((bt, wide), jnp.int32)
        for ct in range(nt):
            di = rt - ct + nt - 1
            a32 = a32 + jax.lax.dot_general(
                xs[ct], slabs_ref[di],                 # (Bt,K)x(K,wide)
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        blocks.append(a32.reshape(bt, kp1, planes, 128))
    acc32 = jnp.concatenate(blocks, axis=-1)           # (Bt, k+1, P, N)
    res = jnp.zeros((bt, kp1, n), jnp.uint32)
    for p in range(planes):
        res = res + (acc32[:, :, p, :].astype(jnp.uint32)
                     << jnp.uint32(8 * p))
    out_ref[:] = acc + res


# ---------------------------------------------------------------------------
# Fused whole-blind-rotate kernel (round 3)
# ---------------------------------------------------------------------------
#
# One pallas_call runs ALL n_lwe CMux steps with the accumulator resident
# in VMEM scratch: grid = (batch_tile, step, wide_chunk), the GGSW slab
# block for (step, chunk) streams from HBM through the automatic Pallas
# input pipeline (double-buffered), and the only HBM traffic for the
# accumulator is one read + one write per batch tile — vs one read+write
# PER STEP for the per-step kernel (cmux_step_pallas), i.e. ~630x less
# accumulator traffic at the production shape.  Digits are computed once
# per step (chunk 0) and cached in an int8 scratch for the other chunks.
#
# MXU shape: each dot is (block_b, 128) x (128, wide/H) — with the default
# H=4 that is 4x wider than the per-step kernel's 128-wide dots, so the
# systolic pipeline drains 4x less often.


def _fused_rotate_kernel(acc_ref, rot_ref, slab_ref, out_ref,
                         acc_s, digs, *, n: int, logn: int, k: int,
                         lvl: int, planes: int, base_log: int,
                         n_steps: int, chunks: int):
    s = pl.program_id(1)
    h = pl.program_id(2)
    nt = n // 128
    kp1 = k + 1
    wide = kp1 * planes * 128
    c_cols = wide // chunks
    groups = c_cols // 128
    bt = acc_ref.shape[0]

    @pl.when(jnp.logical_and(s == 0, h == 0))
    def _():
        acc_s[:] = acc_ref[:]

    @pl.when(h == 0)
    def _():
        acc = acc_s[:]
        rot = rot_ref[0, 0, 0][:, None]                 # (bt, 1)
        rotated = _rotate_neg(acc, rot, n, logn)
        diff = rotated - acc
        ds = _decompose(diff, base_log, lvl)            # [lvl](bt,k+1,N) i8
        for l in range(lvl):
            digs[l] = ds[l]

    # int8 MXU dots for this wide chunk, accumulated per block-row rt.
    # The slab's K axis is ordered (l, j, c) — row block (l, j) spans
    # rows [(l*kp1+j)*128, +128).
    a32 = [jnp.zeros((bt, c_cols), jnp.int32) for _ in range(nt)]
    for l in range(lvl):
        for j in range(kp1):
            d_lj = digs[l][:, j, :]                     # (bt, N) i8
            row0 = (l * kp1 + j) * 128
            for ct in range(nt):
                x = d_lj[:, ct * 128:(ct + 1) * 128]
                for rt in range(nt):
                    di = rt - ct + nt - 1
                    w = slab_ref[0, di, row0:row0 + 128, :]
                    a32[rt] = a32[rt] + jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)

    # CMux accumulate: acc_s[:, jp, rt-block] += partial << 8p.
    # Global column block index = h*groups + g encodes (jp, p) as
    # blk = jp*planes + p; h is traced, so jp/p are traced scalars and the
    # jp destination is selected by predication.
    for rt in range(nt):
        for g in range(groups):
            part = a32[rt][:, g * 128:(g + 1) * 128]
            blk = h * groups + g                        # traced int
            jp = blk // planes
            p = blk % planes
            shifted = part.astype(jnp.uint32) << (jnp.uint32(8) *
                                                  p.astype(jnp.uint32))
            for jp_s in range(kp1):
                @pl.when(jp == jp_s)
                def _(jp_s=jp_s, shifted=shifted, rt=rt):
                    acc_s[:, jp_s, rt * 128:(rt + 1) * 128] = (
                        acc_s[:, jp_s, rt * 128:(rt + 1) * 128] + shifted)

    @pl.when(jnp.logical_and(s == n_steps - 1, h == chunks - 1))
    def _():
        out_ref[:] = acc_s[:]


@functools.partial(jax.jit, static_argnames=("base_log", "interpret",
                                             "block_b", "chunks"))
def blind_rotate_fused(acc, a_rots, ggsw_i8, base_log: int,
                       interpret: bool = False, block_b: int = 128,
                       chunks: int = 4):
    """All n_lwe blind-rotate CMux steps in ONE pallas_call.

    acc:     uint32 (..., k+1, N) — the X^{-b~}-rotated accumulator
    a_rots:  int32 (n_steps, ...) rotation amounts per step
    ggsw_i8: int8 (n_steps, lvl, k+1, k+1, P, 2N) BSK digit planes
             (the same form the mxu/per-step-pallas backends consume)

    The GGSW slabs for all steps are materialized in HBM inside this jit
    (~5 GB at the production shape, ~12 ms of HBM writes per call) and
    streamed chunk-by-chunk through the pipeline; the accumulator lives in
    VMEM scratch across every step.
    """
    lead = acc.shape[:-2]
    kp1, n = acc.shape[-2:]
    orig_shape = acc.shape
    acc = acc.reshape((-1, kp1, n))
    B = acc.shape[0]
    n_steps, lvl, _, _, planes, two_n = ggsw_i8.shape
    assert two_n == 2 * n
    logn = n.bit_length() - 1
    nt = n // 128
    d = 2 * nt - 1
    K = lvl * kp1 * 128
    wide = kp1 * planes * 128
    assert wide % (128 * chunks) == 0
    c_cols = wide // chunks
    bt = B
    for cand in range(min(block_b, B), 0, -1):
        if B % cand == 0:
            bt = cand
            break

    rots = jnp.broadcast_to(jnp.asarray(a_rots, jnp.int32),
                            (n_steps,) + lead).reshape(n_steps, B)

    # (n_steps, D, K, wide) int8 slabs — one Toeplitz block-diagonal slab
    # set per step.  Sequential lax.map, NOT vmap: the log-doubling's
    # intermediate concat stages are ~2x the output, and vmapping over all
    # 630 steps would materialize ~10 GB of intermediates next to the
    # ~5 GB output; lax.map keeps the peak at output + one step.
    ghat2 = jnp.concatenate([ggsw_i8, ggsw_i8], axis=-1)
    slabs = jax.lax.map(build_diag_slabs, ghat2)

    kernel = functools.partial(
        _fused_rotate_kernel, n=n, logn=logn, k=kp1 - 1, lvl=lvl,
        planes=planes, base_log=base_log, n_steps=n_steps, chunks=chunks)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid=(B // bt, n_steps, chunks),
        in_specs=[
            pl.BlockSpec((bt, kp1, n), lambda i, s, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # 4D (steps, tiles, 1, bt) so the block's trailing dims equal
            # the full array dims (TPU block-shape constraint)
            pl.BlockSpec((1, 1, 1, bt), lambda i, s, h: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, K, c_cols), lambda i, s, h: (s, 0, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, kp1, n), lambda i, s, h: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bt, kp1, n), jnp.uint32),
            pltpu.VMEM((lvl, bt, kp1, n), jnp.int8),
        ],
        input_output_aliases={0: 0},
        # The double-buffered slab pipeline + scratch exceeds Mosaic's
        # conservative 16 MB scoped-vmem default at the production shape;
        # v5e/v5p have 128 MB of physical VMEM per core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(acc, rots.reshape(n_steps, B // bt, 1, bt), slabs).reshape(orig_shape)


# ---------------------------------------------------------------------------
# Steps-outer fused blind rotate (round 5)
# ---------------------------------------------------------------------------
#
# The round-3 fused kernel (blind_rotate_fused above) iterated
# (batch_tile, step, chunk) — batch OUTER — so every batch tile re-streamed
# ALL steps' GGSW slabs from HBM (~5 GB x B/bt per call), and it lost at
# production batch.  This variant inverts the grid: steps OUTER, the FULL
# 4096-batch accumulator resident in VMEM for the whole call (21 MB at the
# K4 shape — v5e has 128 MB VMEM/core), each step's slab streamed from HBM
# exactly ONCE (9.8 MB/step, double-buffered by the Pallas pipeline).
#
# Why this breaks the 38%-MFU plateau (profile_pbs_split.py, v5e
# 2026-08-21): the XLA mxu path spends 137 ms/bootstrap-batch on
# rotate/decompose/recombine HBM round-trips (~180 MB/step) and
# materializes the (B, k+1, P, N) int32 dot output (+84 MB/step r+w);
# dots_only alone measures 45% MFU from the in-scan Toeplitz expansion.
# Here every intermediate lives in VMEM; per-step HBM traffic drops from
# ~290 MB to 9.8 MB, leaving the int8 MXU dots (~172 ms/batch at K4) as
# the only large term.
#
# MXU shape: the kernel first writes ALL digits to a VMEM scratch
# (phase 1, VPU), then issues full-batch dots (phase 2): per
# (rt, jp, l, j) one (B, N) x (N, P*128) int8 dot against the rt-major
# slab.  M = 4096 rows stream against each loaded weight tile — ~97%
# weight-load amortization, vs 67% for the first revision's per-chunk
# (256, 128)-row dots (measured 10.3K/s; this layout 12.8K/s).


def _fused_steps_kernel(acc_ref, rots_ref, slab_ref, out_ref, digs, *,
                        n: int, logn: int, k: int, lvl: int, planes: int,
                        base_log: int, drop: int, bc: int):
    s = pl.program_id(0)
    nt = n // 128
    kp1 = k + 1
    pw = planes * 128

    @pl.when(s == 0)
    def _():
        out_ref[:] = acc_ref[:]

    B = out_ref.shape[0]
    # phase 1 (VPU): rotate + decompose the full batch into scratch
    for b0 in range(0, B, bc):
        acc_b = out_ref[b0:b0 + bc]                  # (bc, k+1, N) u32
        rot_b = rots_ref[0, 0, b0:b0 + bc][:, None]  # (bc, 1) i32
        rotated = _rotate_neg(acc_b, rot_b, n, logn)
        diff = rotated - acc_b
        digits = _decompose(diff, base_log, lvl)     # [lvl](bc, k+1, N) i8
        for l in range(lvl):
            digs[b0:b0 + bc, l] = digits[l]

    # phase 2 (MXU): full-batch dots + in-register plane recombination.
    # slab rows for output block rt are ordered (l, j, c in [0, N)) with
    # the Toeplitz diagonal baked in per c-block (build_rt_slabs), so x
    # is a plain (B, N) digit slice — no lane concat, K = N contraction.
    for rt in range(nt):
        for jp in range(kp1):
            a32 = jnp.zeros((B, pw), jnp.int32)
            for l in range(lvl):
                for j in range(kp1):
                    x = digs[:, l, j, :]             # (B, N) i8
                    row0 = (l * kp1 + j) * n
                    w = slab_ref[0, rt, row0:row0 + n,
                                 jp * pw:(jp + 1) * pw]
                    a32 = a32 + jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            blk = a32.reshape(B, planes, 128)
            acc_p = blk[:, 0, :].astype(jnp.uint32)
            if drop:
                acc_p = acc_p << jnp.uint32(8 * drop)
            for p in range(1, planes):
                acc_p = acc_p + (blk[:, p, :].astype(jnp.uint32)
                                 << jnp.uint32(8 * (p + drop)))
            out_ref[:, jp, rt * 128:(rt + 1) * 128] = (
                out_ref[:, jp, rt * 128:(rt + 1) * 128] + acc_p)


def build_rt_slabs(ghat2):
    """rt-major Toeplitz slabs for the steps-outer fused kernel.

    ghat2: int8 (lvl, k+1, k+1, P, 4N).  Returns int8
    (nt, lvl*(k+1)*N, (k+1)*P*128): slab rt is the weight matrix W_rt
    with W_rt[(l, j, ct*128 + c), (jp, p, r)] =
    T_{l,j,jp,p}[128*ct + c, 128*rt + r] — i.e. the block-Toeplitz
    diagonal d = rt - ct is resolved at BUILD time, so the kernel's
    contraction runs over the full (l, j)-row length N in one dot."""
    lvl, kp1, _, planes, four_n = ghat2.shape
    n = four_n // 4
    nt = n // 128
    tiles = build_diag_tiles(ghat2)    # (lvl, j, jp, P, D, c, r)
    rows = []
    for rt in range(nt):
        per_ct = [tiles[:, :, :, :, rt - ct + nt - 1]   # (lvl,j,jp,P,c,r)
                  for ct in range(nt)]
        t = jnp.stack(per_ct, axis=4)   # (lvl, j, jp, P, ct, c, r)
        t = jnp.transpose(t, (0, 1, 4, 5, 2, 3, 6))  # (l,j,ct,c,jp,P,r)
        rows.append(t.reshape(lvl * kp1 * n, kp1 * planes * 128))
    return jnp.stack(rows, axis=0)      # (nt, lvl*kp1*N, wide)


def build_all_step_slabs(ggsw_i8):
    """Per-step rt-major Toeplitz slabs for blind_rotate_fused_steps.

    ggsw_i8: int8 (n_steps, lvl, k+1, k+1, P, 2N) — the BSK's MXU form
    (P may be < 4 for truncated K4T keys).  Returns int8
    (n_steps, nt, lvl*(k+1)*N, (k+1)*P*128) — ~8.3 GB at the K4
    production shape, held in HBM for the life of the key (the same
    trade prepare_bsk makes for the per-step tiles).  Sequential lax.map
    keeps peak memory at output + one step's doubling intermediates."""
    def one(g):
        return build_rt_slabs(jnp.concatenate([g, g], axis=-1))
    return jax.lax.map(one, ggsw_i8)


@functools.partial(jax.jit, static_argnames=("base_log", "drop",
                                             "interpret", "batch_chunk"))
def blind_rotate_fused_steps(acc, a_rots, slabs, base_log: int,
                             drop: int = 0, interpret: bool = False,
                             batch_chunk: int = 256):
    """All n_lwe blind-rotate CMux steps in ONE pallas_call, steps-outer.

    acc:    uint32 (..., k+1, N) — the X^{-b~}-rotated accumulator
    a_rots: int32 (n_steps, ...) rotation amounts per step
    slabs:  int8 (n_steps, nt, lvl*(k+1)*N, (k+1)*P*128) from
            build_all_step_slabs (TfheEngine.prepare_bsk(form="slabs"))
    drop:   TfheParams.bsk_drop_planes — restores the 256^(p+drop) plane
            weights for truncated (K4T) keys

    Exact same int8/int32/uint32 algebra as external_product_mxu —
    asserted bit-for-bit in tests/test_pallas_cmux.py."""
    lead = acc.shape[:-2]
    kp1, n = acc.shape[-2:]
    orig_shape = acc.shape
    acc = acc.reshape((-1, kp1, n))
    B = acc.shape[0]
    n_steps, nt, K, wide = slabs.shape
    lvl = K // (kp1 * n)
    planes = wide // (kp1 * 128)
    logn = n.bit_length() - 1
    bc = B
    for cand in range(min(batch_chunk, B), 0, -1):
        if B % cand == 0:
            bc = cand
            break
    # (n_steps, 1, B): the TPU block-shape rule needs the last two
    # block dims divisible by (8, 128) or equal to the array dims.
    rots = jnp.broadcast_to(jnp.asarray(a_rots, jnp.int32),
                            (n_steps,) + lead).reshape(n_steps, 1, B)

    kernel = functools.partial(
        _fused_steps_kernel, n=n, logn=logn, k=kp1 - 1, lvl=lvl,
        planes=planes, base_log=base_log, drop=drop, bc=bc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((B, kp1, n), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, K, wide), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, kp1, n), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, lvl, kp1, n), jnp.int8),   # digits, full batch
        ],
        # acc in + out (21 MB each at K4/4096) + double-buffered rt-slab
        # (2 x 13.1 MB) + digits scratch (10.5 MB) + one (B, P*128) i32
        # accumulator (8.4 MB) + chunk temporaries; v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(acc, rots, slabs).reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("base_log", "interpret",
                                             "block_b"))
def cmux_step_tiles(acc, rot, tiles, base_log: int,
                    interpret: bool = False, block_b: int = 64):
    """One fused CMux step against PRECOMPUTED diagonal tiles.

    tiles: int8 (lvl, k+1, k+1, P, 2*nt-1, 128, 128) from build_diag_tiles
    — e.g. a per-step slice of TfheEngine.prepare_bsk's all-steps tensor.
    Precomputing moves the Toeplitz expansion OFF the blind-rotate critical
    path: the per-call expansion costs ~1.9 ms/step in XLA (measured v5e,
    2026-08-19) vs the ~0.9 ms/step kernel — i.e. it was HALF of every
    bootstrap."""
    lead = acc.shape[:-2]
    kp1, n = acc.shape[-2:]
    orig_shape = acc.shape
    acc = acc.reshape((-1, kp1, n))
    B = acc.shape[0]
    lvl, _, _, planes, d, _, _ = tiles.shape
    logn = n.bit_length() - 1
    bt = B
    for cand in range(min(block_b, B), 0, -1):
        if B % cand == 0:
            bt = cand
            break
    rot2 = jnp.broadcast_to(jnp.asarray(rot, jnp.int32),
                            lead).reshape(B, 1)
    kernel = functools.partial(
        _cmux_kernel_v1, n=n, logn=logn, k=kp1 - 1, lvl=lvl, planes=planes,
        base_log=base_log)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, kp1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tiles.shape, lambda i: (0,) * 7,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, kp1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(acc, rot2, tiles).reshape(orig_shape)


def build_all_step_tiles(ggsw_i8):
    """Precompute diagonal Toeplitz tiles for EVERY blind-rotate step.

    ggsw_i8: int8 (n_steps, lvl, k+1, k+1, P, 2N) — the BSK's MXU form.
    Returns int8 (n_steps, lvl, k+1, k+1, P, 2*nt-1, 128, 128), ~4.7 GB at
    the production shape, held in HBM for the life of the key.  Sequential
    lax.map keeps peak memory at output + one step's doubling intermediates.
    """
    def one(g):
        return build_diag_tiles(jnp.concatenate([g, g], axis=-1))
    return jax.lax.map(one, ggsw_i8)


@functools.partial(jax.jit, static_argnames=("base_log", "interpret",
                                             "block_b", "variant"))
def cmux_step_pallas(acc, rot, ghat2, base_log: int,
                     interpret: bool = False, block_b: int = 64,
                     variant: str = "v1"):
    """acc + GGSW (x) (X^rot acc - acc), one fused kernel launch.

    acc:   uint32 (..., k+1, N) — leading axes flatten into one batch
    rot:   int32 (...) rotation amounts (any values; reduced mod 2N)
    ghat2: int8 (lvl, k+1, k+1, P, 4N) pre-doubled digit planes of [g, -g]

    VMEM budget at the production shape (N=1024, k=1, lvl=2, P=4,
    block_b=64): diagonal tiles 7.5 MB (grid-invariant block — fetched
    once) + acc/out 1 MB + rotate/digit temporaries ~2 MB, within the
    ~16 MB/core budget; raise block_b on hardware if profiling allows.
    """
    lead = acc.shape[:-2]
    kp1, n = acc.shape[-2:]
    orig_shape = acc.shape
    acc = acc.reshape((-1, kp1, n))
    B = acc.shape[0]
    lvl, _, _, planes, four_n = ghat2.shape
    assert four_n == 4 * n
    logn = n.bit_length() - 1
    bt = B
    for cand in range(min(block_b, B), 0, -1):
        if B % cand == 0:
            bt = cand
            break
    rot2 = jnp.broadcast_to(jnp.asarray(rot, jnp.int32),
                            lead).reshape(B, 1)
    nt = n // 128

    if variant == "v1":
        weights = build_diag_tiles(ghat2)
        kern = _cmux_kernel_v1
        w_index = lambda i: (0,) * 7          # noqa: E731
    elif variant == "v3":
        weights = build_diag_slabs(ghat2)     # (2nt-1, K, wide)
        kern = _cmux_kernel_v3
        w_index = lambda i: (0, 0, 0)         # noqa: E731
    else:
        weights = build_diag_slabs(ghat2)     # (2nt-1, K, wide)
        kern = _cmux_kernel
        w_index = lambda i: (0, 0, 0)         # noqa: E731
    kernel = functools.partial(
        kern, n=n, logn=logn, k=kp1 - 1, lvl=lvl, planes=planes,
        base_log=base_log)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, kp1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, w_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, kp1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # Mosaic's 16 MB scoped-vmem default spills at block_b >= 128
        # (weights 7.5-7.9 MB + acc/out/temporaries); the chip has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(acc, rot2, weights).reshape(orig_shape)
