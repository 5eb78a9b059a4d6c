"""Sampling distributions (ops/sampling.py — SecureRandom twin)."""
import numpy as np
import jax

from node_fhe_accelerate_tpu.ops.sampling import (
    uniform_mod_q, ternary, gaussian, binary_planes,
)
from node_fhe_accelerate_tpu.ops.modular import ModCtx
from node_fhe_accelerate_tpu.ops.u64 import u64_to_np


Q = (1 << 40) - (1 << 32) + 1


def test_uniform_in_range_and_spread():
    ctx = ModCtx(Q)
    vals = u64_to_np(uniform_mod_q(jax.random.PRNGKey(0), (4096,), ctx))
    assert vals.max() < Q
    # spread: mean near Q/2 within 5%
    assert abs(float(vals.astype(np.float64).mean()) / (Q / 2) - 1) < 0.05
    # determinism by key
    vals2 = u64_to_np(uniform_mod_q(jax.random.PRNGKey(0), (4096,), ctx))
    np.testing.assert_array_equal(vals, vals2)


def test_ternary_support_and_balance():
    vals = u64_to_np(ternary(jax.random.PRNGKey(1), (9000,), Q))
    support = set(np.unique(vals).tolist())
    assert support <= {0, 1, Q - 1}
    counts = {v: int((vals == v).sum()) for v in support}
    for v in (0, 1, Q - 1):
        assert abs(counts[v] / 9000 - 1 / 3) < 0.05


def test_gaussian_zero_sigma_is_zero():
    vals = u64_to_np(gaussian(jax.random.PRNGKey(2), (1000,), 0.0, Q))
    assert (vals == 0).all()


def test_gaussian_tiny_sigma_rounds_to_zero():
    # the reference passes 3.2e-11 as sigma — all samples round to 0
    vals = u64_to_np(gaussian(jax.random.PRNGKey(3), (1000,), 3.2e-11, Q))
    assert (vals == 0).all()


def test_gaussian_moderate_sigma_centered():
    sigma = 100.0
    vals = u64_to_np(gaussian(jax.random.PRNGKey(4), (20000,), sigma, Q))
    signed = np.where(vals > Q // 2,
                      vals.astype(np.int64) - Q, vals.astype(np.int64))
    assert abs(signed.mean()) < 5
    assert abs(signed.std() / sigma - 1) < 0.1
    assert (np.abs(signed) < 10 * sigma).all()


def test_binary_support():
    lo, hi = binary_planes(jax.random.PRNGKey(5), (5000,))
    vals = np.asarray(lo)
    assert set(np.unique(vals).tolist()) <= {0, 1}
    assert (np.asarray(hi) == 0).all()
    assert abs(vals.mean() - 0.5) < 0.05
