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
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
