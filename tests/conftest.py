"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The reference's test strategy (SURVEY.md §4) pairs every accelerated path with
a scalar oracle; here the oracle is pure-Python big-int arithmetic and the
"accelerated path" is the JAX implementation, executed on CPU so tests are
hermetic.  Multi-chip sharding tests use the 8 virtual devices.

Environment notes for this image:
* an `axon` TPU PJRT plugin registers itself from sitecustomize and sets
  JAX_PLATFORMS=axon before conftest runs; jax is already imported here, so
  plain env vars are too late — `jax.config.update` before first device use
  is the reliable override.
* do NOT enable JAX_COMPILATION_CACHE_DIR — the persistent cache has
  deadlocked (futex wait) under pytest in this image.
* the stack rlimit is raised before jax spins up its compile thread pool:
  XLA:CPU's LLVM passes recurse deeply on the big fused FHE/ZK programs and
  pthread stacks inherit RLIMIT_STACK at thread creation — the default 8 MB
  intermittently segfaulted long multi-compile pytest runs inside
  backend_compile_and_load.
"""
import os
import resource
import sys

try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (512 * 1024 * 1024, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Serialize XLA:CPU's parallel codegen: the default split-count path
    # intermittently segfaulted inside backend_compile_and_load on this
    # suite's large fused FHE/ZK programs (observed at 3 different compile
    # sites across long multi-compile runs; single-compile repros pass).
    + " --xla_cpu_parallel_codegen_split_count=1"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
