"""Big-integer arithmetic in 8-bit digit planes with MXU matmul products.

The scalar-lane CIOS path (ops/limbs.py) is bit-exact but compiles to
~1.6k HLO ops per 256-bit multiply — minutes of XLA compile time once curve
formulas inline dozens of them.  This module is the TPU-native alternative
used by the ZK fields:

* an integer is (..., D) int32 digits, base 256, little-endian, strictly
  canonical (each digit in [0, 255]);
* multiplication is an outer product + ONE constant matmul: with 8-bit
  digits, every convolution column sum is < D * 255^2 < 2^22, exact in
  float32 — so the digit convolution runs on the MXU as an f32 matmul
  against a constant (D^2, 2D) band matrix;
* carries resolve in log depth: a few magnitude-reduction rounds followed by
  a Kogge-Stone style carry-lookahead via `lax.associative_scan` — no
  O(D) ripple chains, no O(D^2) unrolled carry graphs.

Digit count D is chosen per field with headroom (e.g. D=36 for 256-bit
moduli) so Montgomery R = 2^(8D) >> N.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32

__all__ = [
    "digits_from_int", "digits_from_ints", "digits_to_ints",
    "conv_full_matrix", "conv_full", "conv_const", "conv_square",
    "exact_norm", "add_digits",
    "sub_digits", "geq_digits", "is_zero_digits", "eq_digits", "select",
]


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def digits_from_int(value: int, d: int):
    out = np.empty((d,), dtype=np.int32)
    for i in range(d):
        out[i] = (value >> (8 * i)) & 0xFF
    if value >> (8 * d):
        raise ValueError("value does not fit in digit count")
    return jnp.asarray(out)


def digits_from_ints(values, d: int):
    """Host ints (object array) -> (..., d) strict digit planes.

    Bulk int.to_bytes is ~100x the per-digit indexing loop this replaces
    (ZK circuit tables encode 10^5+ field elements at once)."""
    values = np.asarray(values, dtype=object)
    buf = b"".join(int(v).to_bytes(d, "little")
                   for v in values.reshape(-1))
    out = np.frombuffer(buf, dtype=np.uint8).astype(np.int32)
    return jnp.asarray(out.reshape(values.shape + (d,)))


def digits_to_ints(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.int64)
    out = np.zeros(a.shape[:-1], dtype=object)
    for i in range(a.shape[-1]):
        out += a[..., i].astype(object) << (8 * i)
    return out


# ---------------------------------------------------------------------------
# Convolution products (MXU)
# ---------------------------------------------------------------------------

_conv_cache: dict = {}


def conv_full_matrix(d: int, out_len: int):
    """Constant (d*d, out_len) f32 matrix: maps vec(outer(a,b)) to columns."""
    key = (d, out_len)
    if key not in _conv_cache:
        m = np.zeros((d * d, out_len), dtype=np.float32)
        for i in range(d):
            for j in range(d):
                k = i + j
                if k < out_len:
                    m[i * d + j, k] = 1.0
        # cache as numpy: a jnp constant created inside one jit trace must
        # not leak into another
        _conv_cache[key] = m
    return _conv_cache[key]


def conv_full(a, b, out_len: int | None = None):
    """Digit convolution columns of a*b: (..., out_len) int32, cols < 2^22.

    a, b: strict digit arrays (..., D).  Outer product + ONE constant
    (D^2, out_len) f32 matmul at HIGHEST precision.  Every partial product
    is <= 255^2 and every column sum < D * 255^2 < 2^22, well inside f32's
    exact-integer range (2^24); precision=HIGHEST forces the full bf16x6
    f32-emulation passes on the MXU so the matmul is bit-exact.

    (History: this used to be one grouped `conv_general_dilated` with
    feature_group_count = batch — tiny HLO, but TPU executes per-element
    feature groups ~100x below peak.  The outer+matmul form runs the
    column reduction on the MXU at matmul speed and is the same 3 HLO ops
    per call, so compile time is unchanged.)
    """
    import math as _math

    d = a.shape[-1]
    if out_len is None:
        out_len = 2 * d
    batch_shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    B = int(_math.prod(batch_shape)) if batch_shape else 1
    af = jnp.broadcast_to(a, batch_shape + (d,)).reshape(B, d)
    bf = jnp.broadcast_to(b, batch_shape + (d,)).reshape(B, d)
    # shift-accumulate: column k gets sum_i a_i * b_{k-i}.  D fused
    # mul+pad+add VPU ops — int32-exact, no (B, D^2) intermediate (an
    # outer-product+band-matmul variant moves 2x B*D^2*4 bytes through HBM
    # and runs the MXU at N=2D width; this form is pure elementwise and
    # ~10x faster at large batch).
    acc = None
    for i in range(min(d, out_len)):
        w = min(d, out_len - i)
        term = af[:, i:i + 1] * bf[:, :w]
        term = jnp.pad(term, ((0, 0), (i, out_len - i - w)))
        acc = term if acc is None else acc + term
    return acc.reshape(batch_shape + (out_len,))


def conv_square(a, out_len: int | None = None):
    """Digit convolution of a*a with the triangular halving
    sum_k = a_k'^2-diag + 2 * sum_{i<j, i+j=k} a_i a_j — ~half the VPU
    multiplies of conv_full(a, a)."""
    d = a.shape[-1]
    if out_len is None:
        out_len = 2 * d
    batch_shape = a.shape[:-1]
    import math as _math
    B = int(_math.prod(batch_shape)) if batch_shape else 1
    af = a.reshape(B, d)
    # diagonal a_i^2 lands at column 2i: interleave with zeros
    sq = af * af
    diag = jnp.stack([sq, jnp.zeros_like(sq)], axis=-1).reshape(B, 2 * d)
    if out_len >= 2 * d:
        acc = jnp.pad(diag, ((0, 0), (0, out_len - 2 * d)))
    else:
        acc = diag[:, :out_len]
    for i in range(min(d - 1, out_len)):
        # j > i terms, doubled
        w = min(d - (i + 1), out_len - (2 * i + 1))
        if w <= 0:
            continue
        term = 2 * af[:, i:i + 1] * af[:, i + 1:i + 1 + w]
        term = jnp.pad(term, ((0, 0), (2 * i + 1,
                                       out_len - (2 * i + 1) - w)))
        acc = acc + term
    return acc.reshape(batch_shape + (out_len,))


_toep_cache: dict = {}


def conv_const(a, const_digits, out_len: int | None = None):
    """Digit convolution against a CONSTANT operand — e.g. Montgomery's
    m*q and (T mod R)*q' steps, where q/q' are fixed per field.

    A constant operand turns the convolution into a genuine matmul:
    cols = a @ Toeplitz(const), (B, D) x (D, out_len) in f32 at HIGHEST
    precision (inputs <= 255, columns < 2^22 — exact).  This runs on the
    MXU with a shared RHS, unlike the variable*variable case which is
    inherently a batched rank-1 product and stays on the VPU.

    const_digits: host numpy/jnp (D2,) strict digit array.
    """
    import math as _math

    cd = np.asarray(const_digits, dtype=np.int64)
    d = a.shape[-1]
    d2 = cd.shape[0]
    if out_len is None:
        out_len = d + d2
    key = (cd.tobytes(), d, out_len)
    m = _toep_cache.get(key)
    if m is None:
        m = np.zeros((d, out_len), dtype=np.float32)
        for i in range(d):
            for j in range(d2):
                if i + j < out_len:
                    m[i, i + j] = float(cd[j])
        _toep_cache[key] = m
    batch_shape = a.shape[:-1]
    B = int(_math.prod(batch_shape)) if batch_shape else 1
    cols = jax.lax.dot_general(
        a.reshape(B, d).astype(jnp.float32), jnp.asarray(m),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST).astype(I32)
    return cols.reshape(batch_shape + (out_len,))


# ---------------------------------------------------------------------------
# Carry resolution
# ---------------------------------------------------------------------------


def _ks_add(lo, carry_in_bits):
    """Exact sum of lo (digits <= 255) + carry bits (<= 1 per digit).

    Carry lookahead via two cummax ops: a carry flows out of digit i iff the
    most recent 'generate' (sum > 255) at or below i is more recent than the
    most recent 'kill' (sum < 255).  Returns (strict digits, carry_out)."""
    s = lo + carry_in_bits                    # <= 256
    gen = s > 255
    kill = s < 255                            # neither gen nor propagate
    d = s.shape[-1]
    iota = jax.lax.broadcasted_iota(I32, s.shape, s.ndim - 1) + 1
    gen_pos = jnp.where(gen, iota, 0)
    kill_pos = jnp.where(kill, iota, 0)
    cg = jax.lax.cummax(gen_pos, axis=s.ndim - 1)
    ck = jax.lax.cummax(kill_pos, axis=s.ndim - 1)
    carry_out_of = cg > ck                    # carry flows out of digit i
    c = jnp.concatenate(
        [jnp.zeros_like(s[..., :1]),
         carry_out_of[..., :-1].astype(I32)], axis=-1)
    out = (s + c) & 255
    return out, carry_out_of[..., -1]


def exact_norm(cols, rounds: int = 3):
    """Normalize nonnegative int32 columns (< 2^22) to strict digits.

    `rounds` magnitude-reduction rounds bring every column to <= 256, then
    one Kogge-Stone pass resolves the remaining single-bit carries exactly.
    Returns (digits, carry_out_bool). Carries beyond the array are ignored
    by the caller when the value bound guarantees they are zero.
    """
    x = cols
    dropped = jnp.zeros_like(cols[..., 0])
    for _ in range(rounds):
        lo = x & 255
        hi = x >> 8
        dropped = dropped + hi[..., -1]
        x = lo + jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
    lo = x & 255
    cb = (x >> 8)
    dropped = dropped + cb[..., -1]
    cb = jnp.concatenate(
        [jnp.zeros_like(cb[..., :1]), cb[..., :-1]], axis=-1)
    out, ks_carry = _ks_add(lo, cb)
    return out, dropped + ks_carry.astype(I32)


def add_digits(a, b, plus_one: bool = False):
    """Exact a + b (+1) on strict digit arrays: (digits, carry_out)."""
    s = a + b
    if plus_one:
        s = s.at[..., 0].add(1)
    return exact_norm(s, rounds=1)


def comp255(a):
    return 255 - a


def sub_digits(a, b):
    """Exact a - b on strict arrays: returns (digits, a_geq_b bool).

    a - b = a + comp(b) + 1 - 2^(8D); the top carry is exactly [a >= b],
    and when it is 0 the digits hold a - b + 2^(8D).
    """
    d, c = add_digits(a, comp255(b), plus_one=True)
    return d, c != 0


def geq_digits(a, b):
    _, ge = sub_digits(a, b)
    return ge


def is_zero_digits(a):
    return jnp.all(a == 0, axis=-1)


def eq_digits(a, b):
    return jnp.all(a == b, axis=-1)


def select(pred, a, b):
    return jnp.where(pred[..., None], a, b)
