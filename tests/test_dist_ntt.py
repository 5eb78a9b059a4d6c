"""Distributed 4-step NTT: single-device and 8-way sharded equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from node_fhe_accelerate_tpu.parallel.dist_ntt import DistNTT
from node_fhe_accelerate_tpu.parallel.mesh import make_mesh
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np


Q = 7681  # supports N up to 256 (2-adicity of q-1 is 9)


def test_forward_4step_matches_oracle():
    d = DistNTT(64, Q, n1=8)
    rng = np.random.default_rng(0)
    a = rng.integers(0, Q, 64, dtype=np.uint64)
    got = u64_to_np(jax.jit(d.forward_4step)(u64_from_np(a)))
    want = d.reference_forward(a)
    np.testing.assert_array_equal(got, want)


def test_sharded_forward_matches_single_device():
    n, n1 = 64, 8
    d = DistNTT(n, Q, n1=n1)
    n2 = n // n1
    mesh = make_mesh(8, data=8)
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q, n, dtype=np.uint64)
    planes = u64_from_np(a)
    # lay out as (j1, j2) grid, shard columns (j2)
    grid = (planes[0].reshape(n1, n2), planes[1].reshape(n1, n2))

    f = shard_map(
        d.forward_sharded, mesh=mesh,
        in_specs=((P(None, "data"), P(None, "data")),),
        out_specs=(P(None, "data"), P(None, "data")),
    )
    out = jax.jit(f)(grid)
    # output grid: (k2, k1) sharded over k1; flatten to X[k2*n1 + k1]
    got = u64_to_np(out).reshape(n)
    want = d.reference_forward(a)
    np.testing.assert_array_equal(got, want)


def test_batched_forward_4step():
    d = DistNTT(64, Q, n1=8)
    rng = np.random.default_rng(2)
    a = rng.integers(0, Q, (3, 64), dtype=np.uint64)
    got = u64_to_np(jax.jit(d.forward_4step)(u64_from_np(a)))
    for i in range(3):
        np.testing.assert_array_equal(got[i], d.reference_forward(a[i]))
