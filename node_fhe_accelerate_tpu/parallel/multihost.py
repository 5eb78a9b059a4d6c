"""Multi-host (DCN) scaling: process initialization, host-aware meshes,
and cross-host array assembly.

The reference is a single-machine library — SURVEY.md §5.8 calls the
distributed backend out as net-new for the TPU build.  Single-host
multi-chip sharding lives in parallel/mesh.py (ICI collectives); this
module adds the pod/multi-pod layer:

* `initialize_distributed` wraps `jax.distributed.initialize` with env
  autodetection (TPU pod runtimes export coordinator/process env vars;
  explicit args override for bring-your-own clusters).
* `make_host_mesh` builds a (hosts, local_devices) -> ("data", "model")
  mesh with the DATA axis spanning hosts and the MODEL axis confined to
  one host's ICI domain.  That layout follows the standard TPU scaling
  recipe: cheap, rare collectives (the modular psum of a tally, ~KB per
  step) ride the slow DCN; bandwidth-hungry intra-op collectives (NTT
  all-to-alls, blind-rotate accumulators, MSM bucket reductions) stay on
  ICI.  FHE batch work is embarrassingly data-parallel, so DCN traffic is
  one ciphertext-sized allreduce per aggregation — efficiency stays near
  the >=80% BASELINE target by construction rather than by tuning.
* `host_local_batch` / `assemble_global` wrap
  `jax.make_array_from_process_local_data` so each host feeds only its own
  ballots/ciphertexts into a globally-sharded array (no host ever
  materializes the full election).

Nothing here requires a pod to import or unit-test: on a single process,
`initialize_distributed` is a no-op, meshes have one host row, and the
assembly helpers degrade to plain device_put.  tests/test_parallel.py
exercises exactly that degradation on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["initialize_distributed", "make_host_mesh", "host_local_batch",
           "assemble_global", "process_info"]

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> dict:
    """Join (or skip joining) a multi-host JAX cluster; returns a summary.

    On TPU pods the runtime exports everything and a bare
    `jax.distributed.initialize()` suffices; on other clusters pass the
    coordinator explicitly.  Single-process (no env, no args) is a no-op —
    the same program runs unmodified from a laptop to a pod, the reference
    deployment story this build adds (SURVEY.md §5.8).
    """
    global _initialized
    explicit = coordinator_address is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if (explicit or env) and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address or env,
            num_processes=num_processes, process_id=process_id)
        _initialized = True
    return process_info()


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_host_mesh(model: int = 1) -> Mesh:
    """("data", "model") mesh with hosts stacked along the DATA axis.

    Device order groups each process's local devices contiguously, so the
    "model" axis (size <= local device count) never crosses DCN: intra-op
    collectives stay on ICI, only data-parallel reductions cross hosts.
    """
    procs = jax.process_count()
    local = jax.local_device_count()
    if model > local:
        raise ValueError(
            f"model axis {model} exceeds local device count {local}: the "
            "model axis must stay inside one host's ICI domain")
    # jax.devices() orders by process; reshape (hosts, local) then fold the
    # per-host data slice into the global data axis.
    devs = np.array(jax.devices()).reshape(procs, local)
    devs = devs.reshape(procs * (local // model), model)
    return Mesh(devs, ("data", "model"))


def host_local_batch(global_batch: int) -> tuple[int, int]:
    """(this host's batch slice size, offset) for an even global split."""
    procs = jax.process_count()
    if global_batch % procs:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{procs} processes")
    per = global_batch // procs
    return per, per * jax.process_index()


def assemble_global(mesh: Mesh, local_np, batch_axis: int = 0):
    """Per-host numpy shard -> globally sharded device array.

    Each host passes ONLY its local slice (e.g. the ballots it ingested);
    the result is one logical array sharded over the mesh's "data" axis.
    Single-process this is just device_put with a sharding.
    """
    local_np = np.asarray(local_np)
    spec = [None] * local_np.ndim
    spec[batch_axis] = "data"
    sharding = NamedSharding(mesh, PartitionSpec(*spec))
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    global_shape = list(local_np.shape)
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, local_np, tuple(global_shape))
