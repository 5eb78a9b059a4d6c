"""Stage-split profiling of the device Pippenger MSM on the TPU.

Times the pipeline stages of `Curve._msm_pippenger_impl` separately
(digit split + per-window argsort; segmented prefix scans; boundary
gather + suffix reduction; Horner window combine) to locate the real
bottleneck behind the 1.18s msm_bn254_4096 row (VERDICT r3 next-round
#2).  Each stage variant is a standalone jit whose output is closed by a
tiny d2h read; stage cost = difference of cumulative times (the stages
share a prefix, so each variant re-runs the earlier ones — honest on the
axon relay, where only d2h forces execution).

Run: python scripts/profile_msm_stages.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.curve import bn254_g1
from node_fhe_accelerate_tpu.ops import limbs as lb


def timed(fn, args, tag, iters=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{tag:22s} {t*1e3:9.1f} ms", flush=True)
    return t


def stages(curve, c=8):
    """Cumulative-stage variants of _msm_pippenger_impl."""
    f = curve.fq

    def prep(scalar_limbs, points):
        X, Y, Z = points
        n, Ls = scalar_limbs.shape
        per = 32 // c
        W = Ls * per
        nbuck = 1 << c
        shifts = jnp.arange(per, dtype=jnp.uint32) * c
        d = (scalar_limbs[..., None] >> shifts[None, None, :]) & (nbuck - 1)
        digits = d.reshape(n, W)
        order = jnp.argsort(digits, axis=0)
        dsort = jnp.take_along_axis(digits, order, axis=0)
        Xs = jnp.take(X, order, axis=0)
        Ys = jnp.take(Y, order, axis=0)
        Zs = jnp.take(Z, order, axis=0)
        return dsort, Xs, Ys, Zs, n, W, nbuck

    def upto_sort(scalar_limbs, points):
        dsort, Xs, Ys, Zs, *_ = prep(scalar_limbs, points)
        return Xs

    def scans(scalar_limbs, points):
        dsort, Xs, Ys, Zs, n, W, nbuck = prep(scalar_limbs, points)
        g = 8
        while n % g:
            g //= 2
        ngroups = n // g
        shp = Xs.shape[1:]
        Xg = Xs.reshape((ngroups, g) + shp)
        Yg = Ys.reshape((ngroups, g) + shp)
        Zg = Zs.reshape((ngroups, g) + shp)
        posg = jnp.arange(g).reshape((1, g) + (1,) * len(shp))

        def wbody(i, acc):
            ax, ay, az = acc
            sh = jnp.int32(1) << i
            sx = jnp.roll(ax, sh, axis=1)
            sy = jnp.roll(ay, sh, axis=1)
            sz = jnp.where(posg < sh, 0, jnp.roll(az, sh, axis=1))
            return curve._add_impl(acc, (sx, sy, sz))

        Wx, Wy, Wz = jax.lax.fori_loop(
            0, max(1, g.bit_length() - 1), wbody, (Xg, Yg, Zg)) \
            if g > 1 else (Xg, Yg, Zg)
        Tx, Ty, Tz = curve._prefix_scan_add(
            (Wx[:, -1], Wy[:, -1], Wz[:, -1]))
        return Wx, Wy, Wz, Tx, Ty, Tz, dsort, n, W, nbuck, g

    def upto_scan(scalar_limbs, points):
        return scans(scalar_limbs, points)[0]

    def upto_bounds(scalar_limbs, points):
        Wx, Wy, Wz, Tx, Ty, Tz, dsort, n, W, nbuck, g = \
            scans(scalar_limbs, points)
        shp = Wx.shape[2:]
        Ex = jnp.concatenate([Tx[:1], Tx[:-1]], axis=0)
        Ey = jnp.concatenate([Ty[:1], Ty[:-1]], axis=0)
        Ez = jnp.concatenate([jnp.zeros_like(Tz[:1]), Tz[:-1]], axis=0)
        Wxf = Wx.reshape((n,) + shp)
        Wyf = Wy.reshape((n,) + shp)
        Wzf = Wz.reshape((n,) + shp)
        ks = jnp.arange(nbuck - 1, dtype=dsort.dtype)
        e = jax.vmap(lambda col: jnp.searchsorted(col, ks, side="right"),
                     in_axes=1, out_axes=1)(dsort) - 1
        empty = e < 0
        idx = jnp.maximum(e, 0)[..., None]

        def bound_gather(Wf, T):
            i1 = jnp.broadcast_to(idx, idx.shape[:2] + (Wf.shape[-1],))
            i2 = jnp.broadcast_to(idx // g, idx.shape[:2] + (T.shape[-1],))
            return (jnp.take_along_axis(Wf, i1, axis=0),
                    jnp.take_along_axis(T, i2, axis=0))

        wx, ex = bound_gather(Wxf, Ex)
        wy, ey = bound_gather(Wyf, Ey)
        wz, ez = bound_gather(Wzf, Ez)
        Gx, Gy, Gz = curve._add_impl((wx, wy, wz), (ex, ey, ez))
        Gz = jnp.where(empty[..., None], jnp.zeros_like(Gz), Gz)
        sums = curve._prefix_scan_add((Gx, f.neg(Gy), Gz))
        negsum = (sums[0][-1], sums[1][-1], sums[2][-1])
        ctot = (Tx[-1], Ty[-1], Tz[-1])
        m = curve._double_n(ctot, c)
        m = curve._add_impl(m, curve.negate(ctot))
        S = curve._add_impl(m, negsum)
        return S

    return upto_sort, upto_scan, upto_bounds


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    curve = bn254_g1()
    rng = np.random.default_rng(7)
    pts = curve.fixed_base_mul(list(range(1, n + 1)))
    svals = [int(s) for s in rng.integers(1, 1 << 62, n)]
    # also test full-width scalars (8 limbs — the Groth16 case)
    s_full = [int.from_bytes(rng.bytes(32), "little") % curve.order
              for _ in range(n)]
    for tag, ss in (("62-bit", svals), ("254-bit", s_full)):
        limbs = lb.limbs_from_ints(ss, 8)
        print(f"--- n={n} scalars={tag}", flush=True)
        upto_sort, upto_scan, upto_bounds = stages(curve)
        t_sort = timed(jax.jit(upto_sort), (limbs, pts), "sort+gather")
        t_scan = timed(jax.jit(upto_scan), (limbs, pts), "+segmented scans")
        t_bnd = timed(jax.jit(upto_bounds), (limbs, pts), "+bounds+wsum")
        t_full = timed(jax.jit(partial(curve._msm_pippenger_impl, c=8)),
                       (limbs, pts), "full (inc horner)")
        print(f"  deltas: sort {t_sort*1e3:.0f} | scans "
              f"{(t_scan-t_sort)*1e3:.0f} | bounds {(t_bnd-t_scan)*1e3:.0f}"
              f" | horner {(t_full-t_bnd)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
