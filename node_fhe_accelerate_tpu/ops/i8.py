"""Signed int8 digit planes + MXU negacyclic polynomial contraction.

This is the round-2 engine behind the TFHE external product: instead of
NTT -> pointwise -> INTT per CMux (the reference's structure,
cpp/src/bootstrap_engine.cpp:431-518), the digit x torus negacyclic products
are computed DIRECTLY as one int8 matrix multiplication on the MXU:

* torus operands (uint32) decompose into 4 signed base-256 digit planes;
  gadget-decomposition digits (|d| <= base/2 <= 64) are already int8;
* a negacyclic product against a FIXED polynomial g is a matmul by the
  negacyclic Toeplitz matrix T(g)[c, r] = (X^c g)_r = g~[(r - c) mod 2N]
  where g~ = [g, -g];
* int8 x int8 products accumulate exactly in int32 on the MXU
  (|digit| * |plane| * terms <= 64 * 128 * 6144 < 2^26 for the TFHE-128
  shape), and the final plane recombination sum_p out_p << 8p happens in
  native mod-2^32 arithmetic — the torus modulus wraps for free, so there
  is NO modular reduction anywhere on this path.

Why this is the TPU-native choice: the MXU does 8-bit matmuls at ~2x bf16
FLOPs and ~100x the VPU's elementwise rate; the limb-plane NTT butterfly
chain (ops/ntt.py) is pure VPU.  One fused [batch, 6N] x [6N, 8N] int8
matmul per blind-rotate step replaces 8 full NTTs per ciphertext.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "u32_to_i8_digits", "i8_digit_planes_to_u32", "negacyclic_toeplitz_idx",
    "toeplitz_from_doubled",
]

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32


def u32_to_i8_digits(x, planes: int = 4):
    """Balanced signed base-256 digits of uint32 values.

    Returns int8 of shape x.shape + (planes,) with
        x == sum_p digits[..., p] * 256**p  (mod 2**32)
    and every digit in [-128, 127].  The carry past the top plane wraps mod
    2^32 and is dropped — exact for mod-2^32 (torus) arithmetic.
    """
    x = jnp.asarray(x, U32)
    digits = []
    carry = jnp.zeros_like(x)
    for p in range(planes):
        d = ((x >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)) + carry  # 0..256
        carry = (d >= jnp.uint32(128)).astype(U32)
        ds = d.astype(I32) - (carry.astype(I32) << 8)              # [-128,127]
        digits.append(ds.astype(I8))
    return jnp.stack(digits, axis=-1)


def i8_digit_planes_to_u32(partials):
    """Recombine int32 partial sums per digit plane into uint32 mod 2^32.

    partials: int32 (..., planes) — plane p carries weight 256^p.
    """
    planes = partials.shape[-1]
    out = partials[..., 0].astype(U32)
    for p in range(1, planes):
        out = out + (partials[..., p].astype(U32) << jnp.uint32(8 * p))
    return out


def roll_last(x, shift: int):
    """jnp.roll along the last axis (static shift) — lane-axis rotation."""
    return jnp.roll(x, shift, axis=-1)


def negacyclic_toeplitz_idx(n: int) -> np.ndarray:
    """Static gather indices: IDX[c, r] = (r - c) mod 2N.

    For g~ = concat([g, -g]) (length 2N), g~[IDX[c, r]] == (X^c g)_r, i.e.
    row c of the negacyclic Toeplitz matrix of g.
    """
    c = np.arange(n)[:, None]
    r = np.arange(n)[None, :]
    return ((r - c) % (2 * n)).astype(np.int32)


def toeplitz_from_doubled(ghat, idx):
    """Negacyclic Toeplitz rows from a doubled-and-negated table.

    ghat: int8 (..., 2N, P) digit planes of g~ = [g, -g].
    idx:  int32 (N, N) from negacyclic_toeplitz_idx.
    Returns int8 (..., N, N, P): [..., c, r, p] = ghat[..., (r-c)%2N, p].
    """
    return jnp.take(ghat, jnp.asarray(idx), axis=-2)
