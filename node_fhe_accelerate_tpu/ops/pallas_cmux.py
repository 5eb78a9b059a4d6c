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

__all__ = ["cmux_step_pallas", "build_diag_tiles"]


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
        interpret=interpret,
    )(acc, rot2, weights).reshape(orig_shape)
