"""Fused Pallas kernels for 8-bit digit-plane field arithmetic.

Why: profiling the device Pippenger (scripts/profile_msm_stages.py, v5e
2026-08-20) showed the wide batched Jacobian adds dominate MSM time at
~85 ms per 131k-point add — ~50x below VPU peak.  The digit engine's
convolution (ops/digits.py conv_full) is ~30 chained mul+pad+add passes
plus carry scans, and at MSM widths XLA materializes the (B, 64)
intermediates between passes, so every field multiply makes ~35 round
trips through HBM.  These kernels keep the whole multiply — and for the
point kernels the whole Jacobian group op (~16 multiplies) — resident in
VMEM: one HBM read of the operands, one write of the result.

Algebra is IDENTICAL to ops/digits.py + zk/field.py (Montgomery with
R = 2^(8D), strict canonical digits in/out); the group-law kernels
evaluate zk/curve.py's `jadd_formula`/`jdbl_formula` with this module's
in-VMEM field ops, so XLA/Pallas bit-exactness is by construction and
asserted by tests/test_digits_pallas.py.

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
        dropped = jnp.zeros_like(x[..., 0])
        for _ in range(rounds):
            lo = x & 255
            hi = x >> 8
            dropped = dropped + hi[..., -1]
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
        return out, dropped + carry_of[..., -1].astype(I32)

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


_mul_cache: dict = {}
_jadd_cache: dict = {}
_jdbl_cache: dict = {}


def pallas_field_mul(field, a, b):
    """Montgomery field multiply, whole reduce fused in VMEM."""
    kf = _mul_cache.get(field.q)
    if kf is None:
        kf = _mul_cache[field.q] = _KernelField(field)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = kf.mul(a_ref[:], b_ref[:])

    return _point_call(field, kernel, [a, b], 1)[0]


def pallas_jadd(field, p, q):
    """Fused branchless Jacobian add: zk/curve.py jadd_formula evaluated
    entirely in VMEM (one HBM round trip for ~16 field multiplies)."""
    kf = _jadd_cache.get(field.q)
    if kf is None:
        kf = _jadd_cache[field.q] = _KernelField(field)
    from ..zk.curve import jadd_formula

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (x1[:], y1[:], z1[:])
        Q = (x2[:], y2[:], z2[:])
        X3, Y3, Z3 = jadd_formula(
            kf, P, Q, select=kf.select,
            where_zero=lambda pred, a: jnp.where(pred[..., None],
                                                 jnp.zeros_like(a), a))
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    return _point_call(field, kernel, list(p) + list(q), 3)


def pallas_jdbl(field, p):
    """Fused Jacobian double (dbl-2009-l) in VMEM."""
    kf = _jdbl_cache.get(field.q)
    if kf is None:
        kf = _jdbl_cache[field.q] = _KernelField(field)
    from ..zk.curve import jdbl_formula

    def kernel(x, y, z, ox, oy, oz):
        X3, Y3, Z3 = jdbl_formula(kf, (x[:], y[:], z[:]))
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    return _point_call(field, kernel, list(p), 3)
