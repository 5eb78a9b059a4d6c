"""Exact 64/128-bit unsigned integer arithmetic on uint32 limb planes.

TPU has no 64-bit integer ALU, so Z_q elements (q up to 63 bits, matching the
reference's `ModularArithmetic` over uint64 — cpp/include/modular_arithmetic.h:10-80)
are represented as tuples of uint32 JAX arrays ("limb planes"):

    u64  = (lo, hi)              # value = lo + hi * 2^32
    u128 = (w0, w1, w2, w3)      # value = sum wi * 2^(32 i)

All functions are elementwise over arbitrary leading shapes and are pure jnp,
so XLA fuses the whole chain into VPU loops; the hot compositions (NTT
butterflies) additionally have Pallas kernels in ops/ntt_pallas.py.

Every primitive here is property-tested against Python big-int in
tests/test_u64.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------


def u64_from_int(value: int, shape=()):
    """Broadcast a Python int (< 2^64) to a u64 limb-plane pair."""
    lo = np.uint32(value & 0xFFFFFFFF)
    hi = np.uint32((value >> 32) & 0xFFFFFFFF)
    return (jnp.full(shape, lo, U32), jnp.full(shape, hi, U32))


def u64_from_np(arr) -> tuple:
    """Convert a numpy uint64 (or object/int) array to limb planes."""
    a = np.asarray(arr, dtype=np.uint64)
    lo = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a >> np.uint64(32)).astype(np.uint32)
    return (jnp.asarray(lo), jnp.asarray(hi))


def u64_to_np(x) -> np.ndarray:
    """Convert limb planes back to a numpy uint64 array."""
    lo, hi = x
    return np.asarray(lo, dtype=np.uint64) | (
        np.asarray(hi, dtype=np.uint64) << np.uint64(32)
    )


def u128_to_np(x) -> np.ndarray:
    """Convert 4-plane u128 to numpy object array of Python ints."""
    planes = [np.asarray(p, dtype=np.uint64) for p in x]
    out = np.zeros(planes[0].shape, dtype=object)
    for i, p in enumerate(planes):
        out += p.astype(object) << (32 * i)
    return out


# ---------------------------------------------------------------------------
# 32-bit primitives
# ---------------------------------------------------------------------------


def addc32(a, b, cin=None):
    """32-bit add with carry-in/out. Returns (sum, carry_out in {0,1})."""
    s = a + b
    c = (s < a).astype(U32)
    if cin is not None:
        s2 = s + cin
        c = c + (s2 < s).astype(U32)
        s = s2
    return s, c


def subb32(a, b, bin_=None):
    """32-bit subtract with borrow-in/out. Returns (diff, borrow in {0,1})."""
    d = a - b
    brw = (a < b).astype(U32)
    if bin_ is not None:
        d2 = d - bin_
        brw = brw + (d < bin_).astype(U32)
        d = d2
    return d, brw


def mul32_wide(a, b):
    """Exact 32x32 -> 64 multiply via 16-bit splits. Returns (lo, hi)."""
    a_lo = a & MASK16
    a_hi = a >> 16
    b_lo = b & MASK16
    b_hi = b >> 16
    ll = a_lo * b_lo                      # < 2^32, exact in u32
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid, mc = addc32(lh, hl)              # mid may carry one bit
    lo, lc = addc32(ll, mid << 16)
    hi = hh + (mid >> 16) + (mc << 16) + lc
    return lo, hi


# ---------------------------------------------------------------------------
# u64 arithmetic
# ---------------------------------------------------------------------------


def u64_add(a, b):
    """(a + b) mod 2^64."""
    lo, c = addc32(a[0], b[0])
    hi = a[1] + b[1] + c
    return (lo, hi)


def u64_sub(a, b):
    """(a - b) mod 2^64."""
    lo, brw = subb32(a[0], b[0])
    hi = a[1] - b[1] - brw
    return (lo, hi)


def u64_lt(a, b):
    """a < b elementwise -> bool."""
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def u64_geq(a, b):
    return ~u64_lt(a, b)


def u64_eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def u64_select(pred, a, b):
    """where(pred, a, b) on limb planes. pred is bool, broadcastable."""
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))


def u64_mul_lo(a, b):
    """(a * b) mod 2^64."""
    lo, hi = mul32_wide(a[0], b[0])
    hi = hi + a[0] * b[1] + a[1] * b[0]
    return (lo, hi)


def u64_mul_wide(a, b):
    """Exact 64x64 -> 128 multiply. Returns 4 uint32 planes."""
    p00_lo, p00_hi = mul32_wide(a[0], b[0])
    p01_lo, p01_hi = mul32_wide(a[0], b[1])
    p10_lo, p10_hi = mul32_wide(a[1], b[0])
    p11_lo, p11_hi = mul32_wide(a[1], b[1])

    w0 = p00_lo
    w1, c1a = addc32(p00_hi, p01_lo)
    w1, c1b = addc32(w1, p10_lo)
    w2, c2a = addc32(p01_hi, p10_hi, c1a + c1b)
    w2, c2b = addc32(w2, p11_lo)
    w3 = p11_hi + c2a + c2b
    return (w0, w1, w2, w3)


def u64_shl(a, k: int):
    """(a << k) mod 2^64 for static 0 <= k < 64."""
    if k == 0:
        return a
    if k >= 32:
        return (jnp.zeros_like(a[0]), a[0] << (k - 32) if k > 32 else a[0])
    return (a[0] << k, (a[1] << k) | (a[0] >> (32 - k)))


def u64_shr(a, k: int):
    """a >> k for static 0 <= k < 64."""
    if k == 0:
        return a
    if k >= 32:
        return (a[1] >> (k - 32) if k > 32 else a[1], jnp.zeros_like(a[1]))
    return ((a[0] >> k) | (a[1] << (32 - k)), a[1] >> k)


def u64_and_mask(a, mask: int):
    """a & mask for a static 64-bit mask."""
    return (a[0] & np.uint32(mask & 0xFFFFFFFF),
            a[1] & np.uint32((mask >> 32) & 0xFFFFFFFF))


def u64_or(a, b):
    return (a[0] | b[0], a[1] | b[1])


def u64_zeros(shape=()):
    z = jnp.zeros(shape, U32)
    return (z, z)


# ---------------------------------------------------------------------------
# u128 helpers (4 planes)
# ---------------------------------------------------------------------------


def u128_add(a, b):
    """(a + b) mod 2^128 on 4-plane values."""
    w0, c = addc32(a[0], b[0])
    w1, c = addc32(a[1], b[1], c)
    w2, c = addc32(a[2], b[2], c)
    w3 = a[3] + b[3] + c
    return (w0, w1, w2, w3)


def u128_shr(a, k: int):
    """a >> k for static 0 <= k < 128 on 4-plane values."""
    planes = list(a)
    word = k // 32
    bit = k % 32
    z = jnp.zeros_like(a[0])
    shifted = planes[word:] + [z] * word
    if bit == 0:
        return tuple(shifted)
    out = []
    for i in range(4):
        lo = shifted[i] >> bit
        hi = shifted[i + 1] << (32 - bit) if i + 1 < 4 else z
        out.append(lo | hi)
    return tuple(out)


def u128_lo64(a):
    return (a[0], a[1])


def u128_from_u64(a):
    z = jnp.zeros_like(a[0])
    return (a[0], a[1], z, z)
