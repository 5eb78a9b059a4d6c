"""Generic multi-limb big-integer arithmetic on uint32 lanes.

Foundation for the ZK fields (256-bit BN254, 384-bit BLS12-381 — the
reference's `FieldElement256/384`, cpp/include/zk_field_arithmetic.h:35-300).
A value is a uint32 array with a trailing limb axis of static length L,
little-endian: value = sum a[..., i] * 2^(32 i).  All loops are over the
static limb count, so XLA unrolls and fuses them into flat VPU code; batch
axes lead and vectorize for free.

Montgomery multiplication is CIOS (coarsely integrated operand scanning),
the same algorithm as the reference's multi-limb path
(cpp/src/modular_arithmetic.cpp `MultiLimbModularArithmetic`), carried out on
32-bit lanes with explicit carry chains.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)

__all__ = [
    "limbs_from_int", "limbs_to_int", "limbs_from_ints", "limbs_to_ints",
    "add", "add_mod", "sub_mod", "neg_mod", "geq", "select", "is_zero",
    "mont_mul", "mont_constants",
]


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def limbs_from_int(value: int, n_limbs: int, shape=()):
    out = np.empty(shape + (n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[..., i] = (value >> (32 * i)) & 0xFFFFFFFF
    return jnp.asarray(out)


def limbs_to_int(arr) -> int:
    a = np.asarray(arr, dtype=np.uint64)
    return sum(int(a[..., i]) << (32 * i) for i in range(a.shape[-1]))


def limbs_from_ints(values, n_limbs: int):
    """Array of Python ints -> (..., L) uint32.

    One `int.to_bytes` C call per value + a single frombuffer, instead of
    n_limbs Python bigint shift/mask ops each: this host conversion sat
    on the Groth16 prove critical path (measured 6.4 s for 4098 BN254
    scalars via the old nditer loop on this box — ~2/3 of the prove)."""
    values = np.asarray(values, dtype=object)
    nbytes = 4 * n_limbs
    mod = 1 << (32 * n_limbs)
    buf = b"".join(
        (int(v) % mod).to_bytes(nbytes, "little")
        for v in values.reshape(-1).tolist())
    arr = np.frombuffer(buf, dtype="<u4").reshape(
        values.shape + (n_limbs,)).copy()
    return jnp.asarray(arr)


def limbs_to_ints(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.uint64)
    out = np.zeros(a.shape[:-1], dtype=object)
    for i in range(a.shape[-1]):
        out += a[..., i].astype(object) << (32 * i)
    return out


# ---------------------------------------------------------------------------
# Primitive lane ops
# ---------------------------------------------------------------------------


def _addc(a, b, cin=None):
    s = a + b
    c = (s < a).astype(U32)
    if cin is not None:
        s2 = s + cin
        c = c + (s2 < s).astype(U32)
        s = s2
    return s, c


def _subb(a, b, bin_=None):
    d = a - b
    brw = (a < b).astype(U32)
    if bin_ is not None:
        d2 = d - bin_
        brw = brw + (d < bin_).astype(U32)
        d = d2
    return d, brw


def _mul32(a, b):
    """32x32 -> (lo, hi) exact."""
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid, mc = _addc(lh, hl)
    lo, lc = _addc(ll, mid << 16)
    hi = hh + (mid >> 16) + (mc << 16) + lc
    return lo, hi


# ---------------------------------------------------------------------------
# Multi-limb ops (static L from the trailing axis)
# ---------------------------------------------------------------------------


def add(a, b):
    """(a + b) mod 2^(32L); returns (sum, carry_out)."""
    L = a.shape[-1]
    outs = []
    c = None
    for i in range(L):
        s, c = _addc(a[..., i], b[..., i], c)
        outs.append(s)
    return jnp.stack(outs, axis=-1), c


def _sub(a, b):
    L = a.shape[-1]
    outs = []
    brw = None
    for i in range(L):
        d, brw = _subb(a[..., i], b[..., i], brw)
        outs.append(d)
    return jnp.stack(outs, axis=-1), brw


def geq(a, b):
    """a >= b elementwise over the limb axis."""
    _, brw = _sub(a, b)
    return brw == 0


def is_zero(a):
    L = a.shape[-1]
    z = a[..., 0] == 0
    for i in range(1, L):
        z = z & (a[..., i] == 0)
    return z


def select(pred, a, b):
    return jnp.where(pred[..., None], a, b)


def add_mod(a, b, q):
    """(a + b) mod q for a, b < q < 2^(32L - 1) (no carry out of L limbs)."""
    s, _ = add(a, b)
    d, brw = _sub(s, q)
    return jnp.where((brw == 0)[..., None], d, s)


def sub_mod(a, b, q):
    d, brw = _sub(a, b)
    dq, _ = add(d, q)
    return jnp.where((brw != 0)[..., None], dq, d)


def neg_mod(a, q):
    d, _ = _sub(q, a)
    return jnp.where(is_zero(a)[..., None], a, d)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS)
# ---------------------------------------------------------------------------


def mont_constants(q: int, n_limbs: int) -> dict:
    """Precompute R, R^2 mod q and -q^{-1} mod 2^32 for CIOS."""
    R = 1 << (32 * n_limbs)
    return {
        "q": q,
        "n_limbs": n_limbs,
        "r_mod_q": R % q,
        "r2_mod_q": (R * R) % q,
        "q_inv32": (-pow(q, -1, 1 << 32)) % (1 << 32),
    }


def mont_mul(a, b, q_limbs, q_inv32: int):
    """CIOS Montgomery product a*b*R^{-1} mod q on (..., L) uint32 arrays.

    Standard word-by-word interleaved reduction; t is held as L+1 limbs plus
    a small carry limb, all as separate lanes so XLA keeps everything in
    registers.
    """
    L = a.shape[-1]
    qi = np.uint32(q_inv32)
    zeros = jnp.zeros_like(a[..., 0])
    t = [zeros] * (L + 2)

    for i in range(L):
        ai = a[..., i]
        # t += ai * b
        carry = zeros
        for j in range(L):
            lo, hi = _mul32(ai, b[..., j])
            s, c1 = _addc(t[j], lo, carry)
            t[j] = s
            carry, c2 = _addc(hi, c1)
            carry = carry + c2  # hi + c1 can't overflow with c2 tracked
        s, c1 = _addc(t[L], carry)
        t[L] = s
        t[L + 1] = t[L + 1] + c1

        # m = t0 * q' mod 2^32
        m = t[0] * qi
        # t += m * q; then shift one limb
        lo, hi = _mul32(m, q_limbs[..., 0])
        s, c1 = _addc(t[0], lo)
        carry, c2 = _addc(hi, c1)
        carry = carry + c2
        for j in range(1, L):
            lo, hi = _mul32(m, q_limbs[..., j])
            s, c1 = _addc(t[j], lo, carry)
            t[j - 1] = s
            carry, c2 = _addc(hi, c1)
            carry = carry + c2
        s, c1 = _addc(t[L], carry)
        t[L - 1] = s
        t[L] = t[L + 1] + c1
        t[L + 1] = zeros

    res = jnp.stack(t[:L], axis=-1)
    # Conditional subtract: result may be in [0, 2q); t[L] holds overflow bit
    d, brw = _sub(res, q_limbs)
    need_sub = (t[L] != 0) | (brw == 0)
    return jnp.where(need_sub[..., None], d, res)
