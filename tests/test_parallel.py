"""Multi-chip collectives on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from node_fhe_accelerate_tpu.ops.modular import ModCtx
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np
from node_fhe_accelerate_tpu.parallel.mesh import make_mesh
from node_fhe_accelerate_tpu.parallel.collectives import psum_mod


def test_psum_mod_matches_host():
    q = (1 << 40) - (1 << 32) + 1  # Q_40_1
    ctx = ModCtx(q)
    mesh = make_mesh(8, data=8)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, q, size=(8, 128), dtype=np.uint64)

    def local_sum(planes):
        return psum_mod(ctx, planes, "data")

    f = shard_map(
        local_sum, mesh=mesh,
        in_specs=(P("data", None),), out_specs=P("data", None),
    )
    lo, hi = u64_from_np(vals)
    out = jax.jit(f)((lo, hi))
    got = u64_to_np(out)
    want = np.zeros(128, dtype=np.uint64)
    total = vals.astype(object).sum(axis=0) % q
    want = np.array(total, dtype=np.uint64)
    # After allreduce every shard holds the same full sum.
    for d in range(8):
        np.testing.assert_array_equal(got[d], want)
