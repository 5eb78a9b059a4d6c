"""Fast-tier smoke tests for DEVICE code paths (VERDICT r3 next-round #5).

The default 15-min gate runs on the CPU backend, where `Curve.msm` /
`fixed_base_mul` auto-route to host big-int kernels (zk/curve.py:30-41)
and the heavy device checks live in the slow tier — so a regression in
the device Pippenger could previously survive the gate.  These tests
call the device implementations DIRECTLY at the smallest shapes that
still exercise the production code paths, so breaking
`_msm_pippenger_impl` (or the sorted-scan plumbing under it) fails the
default gate, not a 100-minute slow run.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.curve import bn254_g1, _host_pippenger
from node_fhe_accelerate_tpu.ops import limbs as lb


def test_device_msm_pippenger_smoke():
    """64-point device Pippenger (the production c=8 window) vs the host
    big-int Pippenger oracle — forced through `_msm_pippenger_impl`,
    bypassing the CPU-backend host routing in `Curve.msm`."""
    curve = bn254_g1()
    rng = np.random.default_rng(123)
    n = 64

    # Base points [k_i]G via the host fixed-base table (cheap, and an
    # independent code path from the device Pippenger under test).
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    P = curve.fixed_base_mul(ks, backend="host")
    # Edge cases in the batch: an infinity point and a zero scalar.
    Z = P[2].at[7].set(jnp.zeros_like(P[2][7]))
    P = (P[0], P[1], Z)

    # 64-bit scalars (2 limbs -> 8 windows) keep the device program small
    # enough for the fast tier while exercising every Pippenger stage
    # (digit split, per-window sort, segmented scan, boundary gather,
    # Horner combine).
    ss = [int(rng.integers(1, 1 << 62)) for _ in range(n)]
    ss[3] = 0
    s_limbs = lb.limbs_from_ints(ss, 2)

    got = jax.jit(curve._msm_pippenger_impl,
                  static_argnames=("c",))(s_limbs, P)
    gx, gy, ginf = curve.to_affine_ints((got[0][None], got[1][None],
                                         got[2][None]))

    jac = curve._points_to_host(P)
    want = _host_pippenger(curve.fq.q, ss, jac)
    wx, wy, winf = curve.to_affine_ints(
        curve._points_from_host([want]))
    assert bool(ginf[0]) == bool(winf[0])
    if not ginf[0]:
        assert (int(gx[0]), int(gy[0])) == (int(wx[0]), int(wy[0]))
