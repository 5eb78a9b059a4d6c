"""Fused Pallas TPU kernel for one TFHE blind-rotate step (CMux).

One `pallas_call` per scan step computes, entirely in VMEM per batch tile:

    rotated = X^rot * acc          (negacyclic binary-ladder rotation)
    diff    = rotated - acc        (torus subtraction, free mod 2^32)
    digits  = gadget_decompose(diff)            (balanced signed int8)
    prod    = digits x Toeplitz(g~)             (int8 MXU dots)
    acc'    = acc + recombine_planes(prod)      (CMux accumulate)

vs the XLA path (core/bootstrap.py external_product_mxu), which

* materializes the (lvl, j, jp, P, N, N) int8 Toeplitz expansion in HBM
  every step (~32 MB written + read at the production shape), and
* round-trips acc/rotated/digits/partial-products through HBM between
  the rotate / decompose / dot / recombine kernels (~190 MB/step extra).

Here Toeplitz TILES are built on the fly in VMEM (7 concat+roll doubling
sweeps over a 128x256 int8 strip per tile — the same log-doubling identity
as the XLA path, but 32 KB instead of 32 MB), and the only HBM traffic per
step is acc in/out plus one 256 KB GGSW row.

The GGSW row arrives pre-doubled, (lvl, k+1, k+1, P, 4N) int8 with
ghat2 = [g, -g, g, -g]: a window of 255 entries starting anywhere in
[0, 2N) never wraps, so Toeplitz windows are plain dynamic slices.

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

__all__ = ["cmux_step_pallas"]


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


def _toeplitz_tile(window):
    """(256,) int8 window w -> (128, 256) strip S with S[c, j] = w[j - c]
    for j >= c (j < c is wraparound garbage, never read: the Toeplitz tile
    is S[:, 127:255] and 127 + r >= c for all c <= 127).

    Log-doubling: rows [m, 2m) are rows [0, m) rolled right by m.
    """
    s = window[None, :]
    m = 1
    while m < 128:
        s = jnp.concatenate([s, pltpu.roll(s, m, axis=1)], axis=0)
        m *= 2
    return s


def _cmux_kernel(acc_ref, rot_ref, ghat_ref, out_ref, *,
                 n: int, logn: int, k: int, lvl: int, planes: int,
                 base_log: int):
    acc = acc_ref[:]                                   # (Bt, k+1, N) u32
    rot = rot_ref[:]                                   # (Bt, 1) i32
    rotated = _rotate_neg(acc, rot, n, logn)
    diff = rotated - acc
    digits = _decompose(diff, base_log, lvl)           # [lvl](Bt, k+1, N) i8

    n_tiles = n // 128
    two_n = 2 * n
    for jp in range(k + 1):
        for rt in range(n_tiles):
            r0 = rt * 128
            res = jnp.zeros(acc.shape[:1] + (128,), jnp.uint32)
            for p in range(planes):
                acc_i32 = jnp.zeros(acc.shape[:1] + (128,), jnp.int32)
                for l in range(lvl):
                    for j in range(k + 1):
                        d_lj = digits[l][:, j, :]       # (Bt, N) i8
                        g_row = ghat_ref[l, j, jp, p, :]  # (4N,) i8
                        for ct in range(n_tiles):
                            c0 = ct * 128
                            start = (r0 - c0 - 127) % two_n
                            w = jax.lax.dynamic_slice(
                                g_row, (start,), (256,))
                            tile = _toeplitz_tile(w)[:, 127:255]  # (128,128)
                            d_t = d_lj[:, c0:c0 + 128]            # (Bt,128)
                            acc_i32 = acc_i32 + jax.lax.dot_general(
                                d_t, tile, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                res = res + (acc_i32.astype(jnp.uint32)
                             << jnp.uint32(8 * p))
            out_ref[:, jp, r0:r0 + 128] = acc[:, jp, r0:r0 + 128] + res


@functools.partial(jax.jit, static_argnames=("base_log", "interpret",
                                             "block_b"))
def cmux_step_pallas(acc, rot, ghat2, base_log: int,
                     interpret: bool = False, block_b: int = 128):
    """acc + GGSW (x) (X^rot acc - acc), one fused kernel launch.

    acc:   uint32 (..., k+1, N) — leading axes flatten into one batch
    rot:   int32 (...) rotation amounts (any values; reduced mod 2N)
    ghat2: int8 (lvl, k+1, k+1, P, 4N) pre-doubled digit planes of [g, -g]
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

    kernel = functools.partial(
        _cmux_kernel, n=n, logn=logn, k=kp1 - 1, lvl=lvl, planes=planes,
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
            pl.BlockSpec((lvl, kp1, kp1, planes, four_n),
                         lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, kp1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(acc, rot2, ghat2).reshape(orig_shape)
