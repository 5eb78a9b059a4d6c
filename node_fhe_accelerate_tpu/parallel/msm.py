"""Sharded multi-scalar multiplication over a device mesh.

The reference's Pippenger is single-machine (zk_elliptic_curve.h:193-254);
this is the multi-chip layer the TPU build adds on top of the device
sort/prefix-scan Pippenger (zk/curve.py): points and scalars shard over
the mesh's data axis, every device runs the full bucketed MSM on its local
slice under shard_map (the data-dependent argsort stays LOCAL — under a
plain jit with sharded inputs XLA would globalize the sort and all-gather
the whole point set), and the per-device partial points combine with
log2(K) Jacobian adds.

MSM is associative-commutative over disjoint slices, so weak scaling is
embarrassing: per-device work is the full Pippenger on n/K points and the
only communication is K Jacobian points (one all-gather of ~KB).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["sharded_msm"]


def sharded_msm(curve, scalar_limbs, points, mesh, axis: str = "data",
                c: int = 8, _want_ici_bytes: bool = False):
    """sum_i s_i * P_i with the point set sharded over `axis`.

    scalar_limbs: (n, L) device limb array; points: (X, Y, Z) Jacobian
    limb arrays of leading dim n.  n pads to a multiple of the axis size
    with zero scalars * infinity (same padding rule as Curve.msm).
    Returns a single Jacobian point.

    ``_want_ici_bytes=True`` returns ``(point, ici_bytes)`` where
    ici_bytes = collective bytes in the compiled local program (from its
    HLO) + the combine's gather of the K per-device partial points — the
    telemetry scaling_report.collective_rows records (VERDICT r4 #7).
    """
    k = mesh.shape[axis]
    n = scalar_limbs.shape[0]
    pad = (-n) % k
    if pad:
        scalar_limbs = jnp.concatenate(
            [scalar_limbs,
             jnp.zeros((pad,) + scalar_limbs.shape[1:], scalar_limbs.dtype)])
        inf = curve.infinity((pad,))
        points = tuple(jnp.concatenate([points[i], inf[i]])
                       for i in range(3))

    spec_s = P(axis, *([None] * (scalar_limbs.ndim - 1)))
    spec_p = tuple(P(axis, *([None] * (points[i].ndim - 1)))
                   for i in range(3))

    def local(sl, px, py, pz):
        part = curve._msm_pippenger_impl(sl, (px, py, pz), c=c)
        # leading device axis so out_specs can shard it
        return tuple(t[None] for t in part)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(spec_s,) + spec_p,
        # per-device partial point: rank = point component rank (leading
        # device axis replaces the sharded n axis)
        out_specs=tuple(P(axis, *([None] * (points[i].ndim - 1)))
                        for i in range(3)),
    )
    jf = jax.jit(f)
    ici_bytes = None
    if _want_ici_bytes:
        from ..utils.scaling_report import _collective_ici_bytes
        txt = jf.lower(scalar_limbs, *points).compile().as_text()
        # the log-K combine below reads every device's partial: one
        # all-gather of K Jacobian points (3 coords x L u32 limbs each)
        gather = 3 * k * points[0].shape[-1] * 4
        ici_bytes = _collective_ici_bytes(txt) + gather
    gx, gy, gz = jf(scalar_limbs, *points)

    # combine K per-device partials: log2(K) halving rounds of one batched
    # Jacobian add each (the add formula is branchless, so pairing works
    # on whole arrays)
    while gx.shape[0] > 1:
        m = gx.shape[0]
        half = m // 2
        lo = (gx[:half], gy[:half], gz[:half])
        hi = (gx[half:m - m % 2], gy[half:m - m % 2], gz[half:m - m % 2])
        sx, sy, sz = curve._add_impl(lo, hi)
        if m % 2:
            sx = jnp.concatenate([sx, gx[-1:]])
            sy = jnp.concatenate([sy, gy[-1:]])
            sz = jnp.concatenate([sz, gz[-1:]])
        gx, gy, gz = sx, sy, sz
    result = (gx[0], gy[0], gz[0])
    return (result, ici_bytes) if _want_ici_bytes else result
