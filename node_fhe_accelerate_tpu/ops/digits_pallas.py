"""Fused Pallas kernels for 8-bit digit-plane field arithmetic.

Why: profiling the device Pippenger (scripts/profile_msm_stages.py, v5e
2026-08-20) showed the wide batched Jacobian adds dominate MSM time at
~85 ms per 131k-point add — ~50x below VPU peak.  The digit engine's
convolution (ops/digits.py conv_full) is ~30 chained mul+pad+add passes
plus carry scans, and at MSM widths XLA materializes the (B, 64)
intermediates between passes, so every field multiply makes ~35 round
trips through HBM.  The `pallas_field_mul` kernel keeps one whole
Montgomery multiply resident in VMEM: one HBM read of the operands, one
write of the result.

Granularity (measured, v5e 2026-08-20): a SINGLE fused multiply
compiles in ~6 s; a fully-fused Jacobian add (~23 multiplies inlined
into one kernel) did not finish Mosaic compilation in 40 minutes — the
backend's compile time is super-linear in unrolled kernel size, and
in-kernel `fori_loop` over conv taps needs dynamic `roll`/column
extraction, which the Mosaic pipeline rejects (dynamic_slice) or
crashes on.  So the group-law entry points below fuse at the FIELD-MUL
level instead: every data-independent level of the add-2007-bl/
dbl-2009-l dataflow becomes ONE stacked `pallas_field_mul` call (rows
of all the level's operand pairs concatenated), and the cheap digit
add/sub/select glue stays in XLA, which fuses it between kernel calls.
A 131k-point Jacobian add is then 6 kernel dispatches moving
~3 x 16 MB each instead of ~35 HBM round trips per multiply.

Algebra is IDENTICAL to ops/digits.py + zk/field.py (Montgomery with
R = 2^(8D), strict canonical digits in/out); the level schedules
evaluate exactly the operations of zk/curve.py's
`jadd_formula`/`jdbl_formula` — every field op maps canonical inputs to
the canonical result, so XLA/Pallas bit-exactness holds per-op (not
just per-formula) and is asserted by tests/test_digits_pallas.py.

In-kernel building blocks (all lane-axis ops, digits minor):

* variable x variable convolution: D iterations of
  `acc += roll(b_wide, i) * a[:, i:i+1]` — roll is a static lane
  rotation, the zero padding of b_wide absorbs the wraparound;
* convolution against a CONSTANT (q, q' in the Montgomery reduce): same
  loop with Python-int scalar multipliers (exact i32; avoids depending
  on Mosaic honoring f32 HIGHEST-precision matmuls for exactness);
* carry resolution: the same 3 magnitude rounds as ops/digits.py
  `exact_norm`, with the final Kogge-Stone carry lookahead's cummax
  replaced by a log-step masked-roll max-scan (lane-axis cummax is not
  a Mosaic primitive).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_field_mul", "pallas_jadd", "pallas_jdbl"]

I32 = jnp.int32


def _roll(x, k: int):
    return pltpu.roll(x, k % x.shape[-1], axis=x.ndim - 1)


def _lane(shape):
    return jax.lax.broadcasted_iota(I32, shape, len(shape) - 1)


def _last_col(x):
    """x[..., -1] as a STATIC slice + squeeze.  Scalar integer indexing
    lowers to `dynamic_slice`, which Mosaic does not implement inside TC
    kernels — this was invisible in CPU interpret mode."""
    W = x.shape[-1]
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, W - 1, W, axis=x.ndim - 1), (x.ndim - 1,))


class _KernelField:
    """In-VMEM twin of zk/field.py Field: same Montgomery algebra on
    (R, D) i32 tiles.  Constants (q, q' digits) embed as Python-int
    literals inside the kernel."""

    def __init__(self, field):
        self.D = int(field.n_limbs)
        self.qd = [int(v) for v in np.asarray(field._q_digits_np)]
        self.npd = [int(v) for v in np.asarray(field._np_digits_np)]

    # -- convolution ---------------------------------------------------------
    def _conv_var(self, a, b, out):
        """Columns of a*b to width `out`; a, b strict (R, D)."""
        D = self.D
        R = a.shape[0]
        bw = jnp.concatenate(
            [b, jnp.zeros((R, out - D), I32)], axis=1) if out > D else \
            b[:, :out]
        acc = jnp.zeros((R, out), I32)
        for i in range(min(D, out)):
            acc = acc + _roll(bw, i) * a[:, i:i + 1]
        return acc

    def _conv_const(self, a, const, out):
        """Columns of a*const to width `out`; a (R, W) with digits small
        enough that columns fit i32 (callers bound this); const is a
        list of Python ints <= 255.  Rolled-in wraparound lanes are
        masked to zero (unlike _conv_var there may be no zero padding to
        absorb them when out == W)."""
        R, W = a.shape
        aw = jnp.concatenate(
            [a, jnp.zeros((R, out - W), I32)], axis=1) if out > W else \
            a[:, :out]
        lane = _lane(aw.shape)
        acc = jnp.zeros((R, out), I32)
        for j, cj in enumerate(const):
            if cj and j < out:
                term = jnp.where(lane < j, 0, _roll(aw, j))
                acc = acc + term * cj
        return acc

    # -- carry resolution (mirrors ops/digits.py exact_norm/_ks_add) --------
    def _norm(self, x, rounds: int = 3):
        """(strict digits, carry_out i32).  Top-column carries beyond the
        array are summed into carry_out (callers rely on it only where
        the value bound makes it meaningful, exactly as ops/digits.py)."""
        W = x.shape[-1]
        lane = _lane(x.shape)
        dropped = jnp.zeros(x.shape[:-1], x.dtype)
        for _ in range(rounds):
            lo = x & 255
            hi = x >> 8
            dropped = dropped + _last_col(hi)
            hi_r = jnp.where(lane == 0, 0, _roll(hi, 1))
            x = lo + hi_r
        s = x
        gen = s > 255
        kill = s < 255
        gp = jnp.where(gen, lane + 1, 0)
        kp = jnp.where(kill, lane + 1, 0)
        k = 1
        while k < W:
            gp = jnp.maximum(gp, jnp.where(lane < k, 0, _roll(gp, k)))
            kp = jnp.maximum(kp, jnp.where(lane < k, 0, _roll(kp, k)))
            k *= 2
        carry_of = gp > kp
        c = jnp.where(lane == 0, 0, _roll(carry_of.astype(I32), 1))
        out = (s + c) & 255
        return out, dropped + _last_col(carry_of).astype(I32)

    # -- digit-array ops -----------------------------------------------------
    def _add_digits(self, a, b, plus_one=False):
        s = a + b
        if plus_one:
            s = s + jnp.where(_lane(s.shape) == 0, 1, 0)
        return self._norm(s, rounds=1)

    def _comp255(self, a):
        return 255 - a

    def _sub_digits(self, a, b):
        d, c = self._add_digits(a, self._comp255(b), plus_one=True)
        return d, c != 0

    def _qdig(self, shape):
        lane = _lane(shape)
        out = jnp.zeros(shape, I32)
        for j, v in enumerate(self.qd):
            if v:
                out = jnp.where(lane == j, v, out)
        return out

    # -- field ops (mirror zk/field.py Field) --------------------------------
    def select(self, pred, a, b):
        return jnp.where(pred[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def add(self, a, b):
        s, _ = self._add_digits(a, b)
        q = self._qdig(s.shape)
        d, ge = self._sub_digits(s, q)
        return self.select(ge, d, s)

    def sub(self, a, b):
        d, ge = self._sub_digits(a, b)
        q = self._qdig(d.shape)
        wrapped, _ = self._add_digits(d, q)
        return self.select(ge, d, wrapped)

    def neg(self, a):
        z = jnp.zeros_like(a)
        return self.select(self.is_zero(a), z, self.sub(z, a))

    def _reduce(self, t_cols):
        """Montgomery reduce of full product columns (width 2D)."""
        D = self.D
        T, _ = self._norm(t_cols)
        m_cols = self._conv_const(T[:, :D], self.npd, D)
        m, _ = self._norm(m_cols)
        u_cols = self._conv_const(m, self.qd, 2 * D)
        U, _ = self._norm(u_cols)
        S, _ = self._add_digits(T, U)
        t = S[:, D:]
        q = self._qdig(t.shape)
        d, ge = self._sub_digits(t, q)
        return self.select(ge, d, t)

    def mul(self, a, b):
        return self._reduce(self._conv_var(a, b, 2 * self.D))

    def square(self, a):
        return self.mul(a, a)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_ROWS = 256          # batch rows per grid cell (VMEM ~ a few MB at D=32)


def _tile_rows(B: int) -> int:
    r = 8
    while r * 2 <= min(B, _ROWS) and B % (r * 2) == 0:
        r *= 2
    return r


def _flatten(arrs):
    """(..., D) planes -> (B, D) + batch shape."""
    batch = arrs[0].shape[:-1]
    D = arrs[0].shape[-1]
    B = 1
    for d in batch:
        B *= d
    return [x.reshape(B, D) for x in arrs], batch, B, D


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _point_call(field, kernel_body, inputs, n_out):
    flat, batch, B, D = _flatten(inputs)
    rows = _tile_rows(B)
    pad = (-B) % rows
    if pad:         # zero rows are valid digit arrays; excess discarded
        flat = [jnp.concatenate([x, jnp.zeros((pad, D), I32)]) for x in flat]
    Bp = B + pad
    blk = pl.BlockSpec((rows, D), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel_body,
        grid=(Bp // rows,),
        in_specs=[blk] * len(flat),
        out_specs=tuple([blk] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((Bp, D), I32)
                        for _ in range(n_out)),
        interpret=_interpret(),
    )(*flat)
    return tuple(o[:B].reshape(batch + (D,)) for o in out)


class _KernelFieldT:
    """Digits-on-SUBLANES twin of _KernelField: tiles are (W digits,
    L lanes) with one field element per LANE COLUMN, so a (D, 512) block
    fills all 128 VPU lanes (the (rows, D=32) layout of _KernelField
    uses 32 of 128 — measured 4.4x loss vs XLA at MSM shapes).  Rolls
    move along the sublane axis; per-tap column extraction is a STATIC
    row slice a[i:i+1, :] (no dynamic_slice).  Same Montgomery algebra,
    canonical digits in/out."""

    def __init__(self, field):
        self.D = int(field.n_limbs)
        self.qd = [int(v) for v in np.asarray(field._q_digits_np)]
        self.npd = [int(v) for v in np.asarray(field._np_digits_np)]

    @staticmethod
    def _sub_iota(shape):
        return jax.lax.broadcasted_iota(I32, shape, 0)

    @staticmethod
    def _roll0(x, k: int):
        return pltpu.roll(x, k % x.shape[0], axis=0)

    def _conv_var(self, a, b, out):
        D = self.D
        L = a.shape[1]
        bw = jnp.concatenate([b, jnp.zeros((out - D, L), I32)], axis=0) \
            if out > D else b[:out]
        acc = jnp.zeros((out, L), I32)
        for i in range(min(D, out)):
            acc = acc + self._roll0(bw, i) * a[i:i + 1, :]
        return acc

    def _conv_const(self, a, const, out):
        W, L = a.shape
        aw = jnp.concatenate([a, jnp.zeros((out - W, L), I32)], axis=0) \
            if out > W else a[:out]
        sub = self._sub_iota(aw.shape)
        acc = jnp.zeros((out, L), I32)
        for j, cj in enumerate(const):
            if cj and j < out:
                term = jnp.where(sub < j, 0, self._roll0(aw, j))
                acc = acc + term * cj
        return acc

    def _norm(self, x, rounds: int = 3):
        W = x.shape[0]
        sub = self._sub_iota(x.shape)
        dropped = jnp.zeros((1,) + x.shape[1:], x.dtype)
        for _ in range(rounds):
            lo = x & 255
            hi = x >> 8
            dropped = dropped + hi[W - 1:W]
            hi_r = jnp.where(sub == 0, 0, self._roll0(hi, 1))
            x = lo + hi_r
        s = x
        gen = s > 255
        kill = s < 255
        gp = jnp.where(gen, sub + 1, 0)
        kp = jnp.where(kill, sub + 1, 0)
        k = 1
        while k < W:
            gp = jnp.maximum(gp, jnp.where(sub < k, 0, self._roll0(gp, k)))
            kp = jnp.maximum(kp, jnp.where(sub < k, 0, self._roll0(kp, k)))
            k *= 2
        carry_of = gp > kp
        c = jnp.where(sub == 0, 0, self._roll0(carry_of.astype(I32), 1))
        out = (s + c) & 255
        return out, dropped + carry_of[W - 1:W].astype(I32)

    def _add_digits(self, a, b, plus_one=False):
        s = a + b
        if plus_one:
            s = s + jnp.where(self._sub_iota(s.shape) == 0, 1, 0)
        return self._norm(s, rounds=1)

    def _sub_digits(self, a, b):
        d, c = self._add_digits(a, 255 - b, plus_one=True)
        return d, c != 0

    def _qdig(self, shape):
        sub = self._sub_iota(shape)
        out = jnp.zeros(shape, I32)
        for j, v in enumerate(self.qd):
            if v:
                out = jnp.where(sub == j, v, out)
        return out

    def select(self, pred, a, b):
        # pred: (1, L) bool row
        return jnp.where(pred, a, b)

    def mul(self, a, b):
        D = self.D
        T, _ = self._norm(self._conv_var(a, b, 2 * D))
        m_cols = self._conv_const(T[:D], self.npd, D)
        m, _ = self._norm(m_cols)
        u_cols = self._conv_const(m, self.qd, 2 * D)
        U, _ = self._norm(u_cols)
        S, _ = self._add_digits(T, U)
        t = S[D:]
        q = self._qdig(t.shape)
        d, ge = self._sub_digits(t, q)
        return self.select(ge, d, t)


_mul_cache: dict = {}
_mul_t_cache: dict = {}

_LANES_T = 512       # lane columns per grid cell of the transposed kernel


def _mul_t_raw(field, aT, bT):
    """Fused Montgomery multiply on (D, B) digit-MAJOR arrays (no
    transposes — callers keep the whole computation in this layout)."""
    kf = _mul_t_cache.get(field.q)
    if kf is None:
        kf = _mul_t_cache[field.q] = _KernelFieldT(field)
    D, B = aT.shape
    pad = (-B) % _LANES_T
    if pad:
        aT = jnp.concatenate([aT, jnp.zeros((D, pad), I32)], axis=1)
        bT = jnp.concatenate([bT, jnp.zeros((D, pad), I32)], axis=1)
    Bp = B + pad

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = kf.mul(a_ref[:], b_ref[:])

    blk = pl.BlockSpec((D, _LANES_T), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _LANES_T,),
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((D, Bp), I32),
        interpret=_interpret(),
    )(aT, bT)
    return out[:, :B]


def pallas_field_mul_t(field, a, b):
    """Transposed-layout fused Montgomery multiply.

    a, b: (..., D) digit planes (the library's standard layout).  The
    operands are flattened and TRANSPOSED to (D, B) so the kernel's
    tiles put one element per lane column (full VPU width); the result
    transposes back.  Measured on v5e (chained, no dispatch floor):
    1.96 ms/mul at B=131072 vs 14.9 ms XLA and 16.6 ms for the
    (rows, D) kernel — the transposed tile is ~VPU-bound, the other two
    waste 3/4 of the lanes."""
    batch = a.shape[:-1]
    D = a.shape[-1]
    B = 1
    for d in batch:
        B *= d
    out = _mul_t_raw(field, a.reshape(B, D).T, b.reshape(B, D).T)
    return out.T.reshape(batch + (D,))


class _TField:
    """Digit-MAJOR ((D, ...lanes) layout) twin of zk/field.py Field.

    mul/square run as the transposed fused kernel (_mul_t_raw); the
    cheap glue (add/sub/select/predicates, exact carry resolution) is
    plain XLA along axis 0, mirroring ops/digits.py exactly — every op
    maps canonical digits to canonical digits, so compositions are
    bit-identical to the digit-minor path no matter how they fuse.
    Evaluating zk/curve.py's `jadd_formula`/`jdbl_formula` with this
    field object IS the transposed Pallas point op."""

    def __init__(self, field):
        self.f = field
        self.D = int(field.n_limbs)
        # numpy, not jnp: a device constant created inside one jit trace
        # and cached on self leaks into later traces (UnexpectedTracer).
        self._q_col_np = np.asarray(field._q_digits_np).reshape(self.D, 1)

    @property
    def _q_col(self):
        return jnp.asarray(self._q_col_np)

    # -- carry resolution (exact_norm/_ks_add along axis 0) -----------------
    def _norm1(self, s):
        lo = s & 255
        hi = s >> 8
        dropped = hi[self.D - 1]              # top-digit carry out
        x = lo + jnp.concatenate(
            [jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
        lo2 = x & 255
        cb = x >> 8
        dropped = dropped + cb[self.D - 1]
        cbs = jnp.concatenate(
            [jnp.zeros_like(cb[:1]), cb[:-1]], axis=0)
        s2 = lo2 + cbs
        gen = s2 > 255
        kill = s2 < 255
        iota = jax.lax.broadcasted_iota(I32, s2.shape, 0) + 1
        cg = jax.lax.cummax(jnp.where(gen, iota, 0), axis=0)
        ck = jax.lax.cummax(jnp.where(kill, iota, 0), axis=0)
        carry_of = cg > ck
        c = jnp.concatenate(
            [jnp.zeros_like(s2[:1]),
             carry_of[:-1].astype(I32)], axis=0)
        out = (s2 + c) & 255
        return out, dropped + carry_of[self.D - 1].astype(I32)

    def _add_digits(self, a, b, plus_one=False):
        s = a + b
        if plus_one:
            s = s.at[0].add(1)
        return self._norm1(s)

    def _sub_digits(self, a, b):
        d, c = self._add_digits(a, 255 - b, plus_one=True)
        return d, c != 0

    # -- Field interface -----------------------------------------------------
    def add(self, a, b):
        s, _ = self._add_digits(a, b)
        d, ge = self._sub_digits(s, self._q_col)
        return self.select(ge, d, s)

    def sub(self, a, b):
        d, ge = self._sub_digits(a, b)
        wrapped, _ = self._add_digits(d, self._q_col)
        return self.select(ge, d, wrapped)

    def neg(self, a):
        z = jnp.zeros_like(a)
        return self.select(self.is_zero(a), z, self.sub(z, a))

    def mul(self, a, b):
        return _mul_t_raw(self.f, a, b)

    def square(self, a):
        return _mul_t_raw(self.f, a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, pred, a, b):
        return jnp.where(pred[None], a, b)


class _TField2:
    """Digit-major twin of zk/field2.py Field2: an Fq2 element is the
    row-concatenation (2L, ...lanes) of its components; arithmetic is
    the same Karatsuba/componentwise algebra over _TField, so the G2
    Jacobian path runs on the transposed kernels unchanged."""

    def __init__(self, field2):
        self.f2 = field2
        self.bt = _TField(field2.base)
        self.L = int(field2.base.n_limbs)

    def _split(self, a):
        return a[:self.L], a[self.L:]

    def _join(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def add(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(self.bt.add(a0, b0), self.bt.add(a1, b1))

    def sub(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(self.bt.sub(a0, b0), self.bt.sub(a1, b1))

    def neg(self, a):
        a0, a1 = self._split(a)
        return self._join(self.bt.neg(a0), self.bt.neg(a1))

    def mul(self, a, b):
        f = self.bt
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        v0 = f.mul(a0, b0)
        v1 = f.mul(a1, b1)
        c0 = f.sub(v0, v1)
        t = f.mul(f.add(a0, a1), f.add(b0, b1))
        c1 = f.sub(f.sub(t, v0), v1)
        return self._join(c0, c1)

    def square(self, a):
        f = self.bt
        a0, a1 = self._split(a)
        c0 = f.mul(f.add(a0, a1), f.sub(a0, a1))
        m = f.mul(a0, a1)
        return self._join(c0, f.add(m, m))

    def is_zero(self, a):
        a0, a1 = self._split(a)
        return self.bt.is_zero(a0) & self.bt.is_zero(a1)

    def eq(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self.bt.eq(a0, b0) & self.bt.eq(a1, b1)

    def select(self, pred, a, b):
        return jnp.where(pred[None], a, b)


_tfield_cache: dict = {}


def _tfield(field):
    key = (field.q, field.n_limbs)
    tf = _tfield_cache.get(key)
    if tf is None:
        tf = _TField2(field) if hasattr(field, "base") else _TField(field)
        _tfield_cache[key] = tf
    return tf


def _to_t(arrs):
    batch = arrs[0].shape[:-1]
    D = arrs[0].shape[-1]
    B = 1
    for d in batch:
        B *= d
    return [x.reshape(B, D).T for x in arrs], batch, D


def _from_t(arrs, batch, D):
    return tuple(x.T.reshape(batch + (D,)) for x in arrs)


def pallas_jadd_t(field, p, q):
    """Branchless Jacobian add in the transposed domain: transpose the
    six coordinate planes once, evaluate zk/curve.py's `jadd_formula`
    verbatim over the _TField (multiplies = fused transposed kernels,
    glue = XLA), transpose the result back."""
    from ..zk.curve import jadd_formula
    tf = _tfield(field)
    flat, batch, D = _to_t(list(p) + list(q))
    pT = tuple(flat[:3])
    qT = tuple(flat[3:])
    out = jadd_formula(
        tf, pT, qT, select=tf.select,
        where_zero=lambda pred, a: jnp.where(pred[None],
                                             jnp.zeros_like(a), a))
    return _from_t(out, batch, D)


def pallas_jdbl_t(field, p):
    """Jacobian double in the transposed domain (see pallas_jadd_t)."""
    from ..zk.curve import jdbl_formula
    tf = _tfield(field)
    flat, batch, D = _to_t(list(p))
    out = jdbl_formula(tf, tuple(flat))
    return _from_t(out, batch, D)


def pallas_field_mul(field, a, b):
    """Montgomery field multiply, whole reduce fused in VMEM."""
    kf = _mul_cache.get(field.q)
    if kf is None:
        kf = _mul_cache[field.q] = _KernelField(field)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = kf.mul(a_ref[:], b_ref[:])

    return _point_call(field, kernel, [a, b], 1)[0]


def pallas_field_mul_pairs(field, pairs):
    """k independent multiplies as ONE kernel dispatch: the (a_i, b_i)
    pairs (identical shapes) are row-stacked, multiplied by the same
    fused kernel, and split back.  This is the batching unit of the
    level-scheduled group-law ops below — one dispatch + one HBM round
    trip per dataflow level instead of per multiply."""
    a0 = pairs[0][0]
    batch = a0.shape[:-1]
    D = a0.shape[-1]
    B = 1
    for d in batch:
        B *= d
    A = jnp.concatenate([a.reshape(B, D) for a, _ in pairs], axis=0)
    Bc = jnp.concatenate([b.reshape(B, D) for _, b in pairs], axis=0)
    out = pallas_field_mul(field, A, Bc)
    return tuple(out[i * B:(i + 1) * B].reshape(batch + (D,))
                 for i in range(len(pairs)))


def pallas_jadd(field, p, q):
    """Branchless Jacobian add (add-2007-bl + dbl/infinity masks, the
    exact algebra of zk/curve.py `jadd_formula`), with every multiply
    routed through stacked fused-mul kernels in 6 dataflow levels:

      L1  Z1^2, Z2^2, X1^2, Y1^2, (Z1+Z2)^2, 2Y1*Z1      (add + dbl prep)
      L2  U1, U2, Z2*Z2Z2, Z1*Z1Z1, B^2, (X1+B)^2
      L3  S1, S2, E^2
      L4  (2H)^2, rr^2, E*(D-X3d)
      L5  H*I, U1*I, Z3
      L6  S1*J, rr*(V-X3)

    Every field op is canonical-in/canonical-out, so the results are
    bit-identical to the XLA path regardless of scheduling."""
    f = field
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    M = lambda prs: pallas_field_mul_pairs(field, prs)    # noqa: E731

    Z1pZ2 = f.add(Z1, Z2)
    Y1x2 = f.add(Y1, Y1)
    Z1Z1, Z2Z2, A, B, SS, dZ3 = M([
        (Z1, Z1), (Z2, Z2), (X1, X1), (Y1, Y1), (Z1pZ2, Z1pZ2),
        (Y1x2, Z1)])
    X1B = f.add(X1, B)
    U1, U2, Za, Zb, C, tt = M([
        (X1, Z2Z2), (X2, Z1Z1), (Z2, Z2Z2), (Z1, Z1Z1), (B, B),
        (X1B, X1B)])
    E = f.add(f.add(A, A), A)
    tAC = f.sub(f.sub(tt, A), C)
    Dd = f.add(tAC, tAC)
    S1, S2, F = M([(Y1, Za), (Y2, Zb), (E, E)])
    H = f.sub(U2, U1)
    S2mS1 = f.sub(S2, S1)
    rr = f.add(S2mS1, S2mS1)
    H2 = f.add(H, H)
    X3d = f.sub(F, f.add(Dd, Dd))
    DmX3 = f.sub(Dd, X3d)
    I, RR, EDX = M([(H2, H2), (rr, rr), (E, DmX3)])
    ZZm = f.sub(f.sub(SS, Z1Z1), Z2Z2)
    J, V, Z3 = M([(H, I), (U1, I), (ZZm, H)])
    X3 = f.sub(f.sub(RR, J), f.add(V, V))
    VmX3 = f.sub(V, X3)
    S1J, rV = M([(S1, J), (rr, VmX3)])
    Y3 = f.sub(rV, f.add(S1J, S1J))

    # doubling-path outputs (dbl-2009-l on p, same terms as jdbl_formula)
    eightC = f.add(f.add(f.add(C, C), f.add(C, C)),
                   f.add(f.add(C, C), f.add(C, C)))
    dY3 = f.sub(EDX, eightC)

    same_x = f.is_zero(H)
    same_y = f.is_zero(S2mS1)
    p_inf = f.is_zero(Z1)
    q_inf = f.is_zero(Z2)
    use_dbl = same_x & same_y & ~p_inf & ~q_inf
    to_inf = same_x & ~same_y & ~p_inf & ~q_inf

    X3 = f.select(use_dbl, X3d, X3)
    Y3 = f.select(use_dbl, dY3, Y3)
    Z3 = f.select(use_dbl, dZ3, Z3)
    Z3 = f.select(to_inf, jnp.zeros_like(Z3), Z3)
    X3 = f.select(p_inf, X2, X3)
    Y3 = f.select(p_inf, Y2, Y3)
    Z3 = f.select(p_inf, Z2, Z3)
    X3 = f.select(q_inf, X1, X3)
    Y3 = f.select(q_inf, Y1, Y3)
    Z3 = f.select(q_inf, Z1, Z3)
    return (X3, Y3, Z3)


def pallas_jdbl(field, p):
    """Jacobian double (dbl-2009-l), multiplies in 4 stacked levels."""
    f = field
    X, Y, Z = p
    M = lambda prs: pallas_field_mul_pairs(field, prs)    # noqa: E731

    Yx2 = f.add(Y, Y)
    A, B, Z3 = M([(X, X), (Y, Y), (Yx2, Z)])
    XB = f.add(X, B)
    C, tt = M([(B, B), (XB, XB)])
    tAC = f.sub(f.sub(tt, A), C)
    Dd = f.add(tAC, tAC)
    E = f.add(f.add(A, A), A)
    (F,) = M([(E, E)])
    X3 = f.sub(F, f.add(Dd, Dd))
    (EDX,) = M([(E, f.sub(Dd, X3))])
    eightC = f.add(f.add(f.add(C, C), f.add(C, C)),
                   f.add(f.add(C, C), f.add(C, C)))
    Y3 = f.sub(EDX, eightC)
    return (X3, Y3, Z3)
