"""Sharded programmable bootstrapping: batch axis over the mesh.

The TFHE blind rotate is a scan over the LWE mask with a per-step MXU
contraction (core/bootstrap.py); its batch axis is embarrassingly parallel.
Multi-chip PBS therefore shards the ciphertext batch over the "data" mesh
axis with the bootstrap key REPLICATED (it is read-only and shared by every
step) — no collectives inside the rotation at all; XLA partitions the whole
scan per-chip.  This is SURVEY.md §2.1's "ciphertext-batch sharding across
chips" mapping, a story the single-machine reference has no analog for.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bootstrap import TfheEngine, BootstrapKey, LweCiphertext

__all__ = ["shard_lwe_batch", "replicate_bsk", "sharded_bootstrap_fn"]


def shard_lwe_batch(lwe: LweCiphertext, mesh: Mesh,
                    axis: str = "data") -> LweCiphertext:
    """Place a batched LWE ciphertext with the leading batch axis sharded."""
    sh_a = NamedSharding(mesh, P(axis, None))
    sh_b = NamedSharding(mesh, P(axis))
    return LweCiphertext(a=jax.device_put(lwe.a, sh_a),
                         b=jax.device_put(lwe.b, sh_b))


def replicate_bsk(bsk: BootstrapKey, mesh: Mesh) -> BootstrapKey:
    """Replicate the bootstrap key on every device of the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), bsk)


def sharded_bootstrap_fn(eng: TfheEngine, mesh: Mesh, axis: str = "data"):
    """jitted (lwe, bsk, test_poly) -> lwe' with batch-sharded outputs.

    Inputs should be placed with shard_lwe_batch / replicate_bsk; the
    sharding constraint on the output keeps XLA from gathering the batch.
    """
    sh_a = NamedSharding(mesh, P(axis, None))
    sh_b = NamedSharding(mesh, P(axis))

    def fn(lwe, bsk, test_poly):
        out = eng.bootstrap_with_test_poly(lwe, bsk, test_poly)
        return LweCiphertext(
            a=jax.lax.with_sharding_constraint(out.a, sh_a),
            b=jax.lax.with_sharding_constraint(out.b, sh_b))

    return jax.jit(fn)
