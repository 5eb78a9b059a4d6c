"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The reference's test strategy (SURVEY.md §4) pairs every accelerated path with
a scalar oracle; here the oracle is pure-Python big-int arithmetic and the
"accelerated path" is the JAX/Pallas implementation, executed on CPU so tests
are hermetic.  Multi-chip sharding tests use the 8 virtual devices.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
