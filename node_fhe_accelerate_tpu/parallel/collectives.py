"""Cross-chip collectives on limb-plane Z_q values.

`jax.lax.psum` adds uint32 lanes independently and would drop the u64 carry
chain, so modular reductions across chips use recursive doubling with
`lax.ppermute` + the limb-plane modular add: log2(n_devices) ICI hops, each a
single fused add — the TPU equivalent of the reference's tree-reduction tally
(encryption.cpp:1366-1460) stretched across the mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.modular import ModCtx

__all__ = ["psum_mod", "allreduce_mod_tree"]


def psum_mod(ctx: ModCtx, planes, axis_name: str):
    """All-reduce modular sum of (lo, hi) planes along a mesh axis.

    Recursive doubling: after step s every device holds the sum of its
    2^(s+1)-neighborhood; after log2(n) steps, the full modular sum.
    Requires a power-of-two axis size (mesh sizes are).
    """
    n = lax.axis_size(axis_name)
    assert n & (n - 1) == 0, "axis size must be a power of two"
    acc = planes
    span = 1
    while span < n:
        # Each device swaps running sums with its partner at distance `span`.
        perm = []
        for i in range(n):
            p = i + span if (i // span) % 2 == 0 else i - span
            perm.append((i, p))
        other = (
            lax.ppermute(acc[0], axis_name, perm),
            lax.ppermute(acc[1], axis_name, perm),
        )
        acc = ctx.add(acc, other)
        span *= 2
    return acc


def allreduce_mod_tree(ctx: ModCtx, planes, axis_name: str):
    """Alias with the reference's tree-reduce name (encryption.h:308)."""
    return psum_mod(ctx, planes, axis_name)
