"""Test configuration: run all tests on a REAL virtual 8-device CPU mesh.

The reference's test strategy (SURVEY.md §4) pairs every accelerated path with
a scalar oracle; here the oracle is pure-Python big-int arithmetic and the
"accelerated path" is the JAX implementation, executed on CPU so tests are
hermetic.  Multi-chip sharding tests use the 8 virtual devices.

Environment note: this image ships an `axon` TPU PJRT plugin that registers
itself from sitecustomize BEFORE conftest runs and overrides JAX_PLATFORMS —
tests would silently run against the (single) remote TPU with serialized
remote compilation.  We detect that and re-exec pytest once with a scrubbed
environment so the forced CPU host platform actually takes effect.

NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR here — the persistent cache has
deadlocked (futex wait) under pytest in this image.
"""
import os
import sys

_GUARD = "_NFA_TPU_TESTS_REEXECED"

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(_GUARD):
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["PYTHONPATH"] = ""          # drop the axon sitecustomize
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:],
              env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
