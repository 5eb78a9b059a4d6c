"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: batched negacyclic NTT throughput at degree 1024 (the reference's
best suite result is 116.5 Kops/s on M4 Max AMX — BENCHMARK_REPORT.md:86-97,
BASELINE.md).  vs_baseline = our NTTs/sec / 116500.

The batch dimension is the TPU's friend: one fused program transforms
thousands of polynomials per dispatch, which is exactly how the FHE workloads
(batch encrypt, blind-rotate accumulators, tally pipelines) consume the NTT.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

from node_fhe_accelerate_tpu.ops.ntt import NTTContext
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np
from node_fhe_accelerate_tpu.core.params import Primes

BASELINE_NTT_1024_OPS = 116_500.0  # M4 Max AMX matrix NTT, BASELINE.md


def main():
    n = 1024
    q = Primes.Q_40_1  # 2^40 - 2^32 + 1 (Solinas fast path)
    batch = 8192
    ntt = NTTContext(n, q)

    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(batch, n), dtype=np.uint64)
    planes = u64_from_np(a)
    fwd = jax.jit(ntt.forward)

    # Warmup/compile
    out = fwd(planes)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(planes)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ntts_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "ntt_1024_throughput",
        "value": round(ntts_per_sec, 1),
        "unit": "ntt/s",
        "vs_baseline": round(ntts_per_sec / BASELINE_NTT_1024_OPS, 3),
    }))


if __name__ == "__main__":
    main()
