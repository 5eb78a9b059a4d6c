"""Device mesh construction for multi-chip FHE/ZK pipelines.

The reference is a single-machine library (SURVEY.md §5.8: no distributed
backend exists there); this module *creates* the multi-chip story for the TPU
build: meshes over ICI with named axes

    "data"  — ciphertext/ballot batch sharding (the dominant FHE axis)
    "model" — intra-op sharding (large-N NTT stage groups, MSM buckets)

Defaults to a 1-D data mesh over all local devices; tests run on the
8-virtual-device CPU backend (tests/conftest.py).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

__all__ = ["make_mesh", "data_sharding", "replicated"]


def make_mesh(n_devices: int | None = None, data: int | None = None,
              model: int = 1) -> Mesh:
    """Mesh of shape (data, model) over the first data*model devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if data is None:
        data = n_devices // model
    use = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(use, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard one batch axis over "data", replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
