"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: TFHE programmable-bootstrap throughput at the production shape
(n=630, N=1024, k=1 — the reference's TFHE_128 LWE/GLWE geometry,
parameter_set.cpp:108-137) with the level-2 gadget preset (Bg=2^8, l=2)
and the auto-selected external-product backend: the fused Pallas CMux
kernel on TPU (ops/pallas_cmux.py — rotate + decompose + int8 MXU
Toeplitz dots in one VMEM-resident kernel per blind-rotate step; A/B'd
fastest on v5e, benchmark_results/ab_pallas_v5e.jsonl), the XLA int8 MXU
path elsewhere (core/bootstrap.py, ops/i8.py).

vs_baseline = bootstraps/s / 50: the reference's only bootstrap anchor is
its "<20 ms per bootstrap" README claim on M4 Max (README.md:75,
BASELINE.md), i.e. ~50 bootstraps/s/machine.

The run is honest end-to-end: real BSK keygen, real LWE encrypt, timed
jitted bootstrap over a batch of 4096, and a full decode-correctness check
against the plaintexts AFTER timing (any device->host transfer before the
loop would poison the axon dispatch path — see docs/OPERATIONS.md).

Secondary metrics (NTT throughput etc.) live in the committed benchmark
suite: `python -m node_fhe_accelerate_tpu.utils.bench_suite` writes the
full CSV/JSON artifacts under benchmark_results/.
"""
import json
import sys
import threading
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Device-init watchdog: when the axon relay is down, jax.devices() hangs
# FOREVER (no error) — observed 2026-08-18.  Emit an explanatory JSON line
# instead of letting the driver time out with no artifact.
_init_done = threading.Event()


def _watchdog(limit_s: float = 300.0):
    if not _init_done.wait(limit_s):
        print(json.dumps({
            "metric": "pbs_throughput_n630_N1024", "value": 0.0,
            "unit": "bootstraps/s", "vs_baseline": 0.0,
            "error": f"device init exceeded {limit_s:.0f}s — axon tunnel "
                     "down (jax.devices() hang); last measured rate on this "
                     "code: 3603.4 bootstraps/s (2026-08-19, v5e)",
        }), flush=True)
        os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import numpy as np
import jax

# Persistent XLA compilation cache: bootstrap-program compiles are
# minutes-scale through the axon remote-compile path; repeat bench runs
# (and the driver's round-end run) skip them entirely on a warm cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

jax.devices()            # force backend init under the watchdog
_init_done.set()

import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.bootstrap import TfheEngine, TFHE_BOOT_128_L2

BASELINE_BOOTSTRAPS_PER_SEC = 50.0  # M4 Max, <20ms/bootstrap (README.md:75)


def main():
    batch = 4096
    p = TFHE_BOOT_128_L2()
    eng = TfheEngine(p)   # auto backend: fused Pallas CMux on TPU

    # BSK disk cache: repeat runs skip the ~minutes keygen.  On a miss the
    # key is generated now but STORED only after the timed loop — store()
    # reads the whole BSK back to host, and any d2h before timing poisons
    # the axon dispatch path.
    from node_fhe_accelerate_tpu.core.keycache import BootstrapKeyCache
    cache = BootstrapKeyCache(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".keycache"))
    lwe_sk, glwe_sk, bsk = cache.load(eng, 0)
    bsk_was_cached = bsk is not None
    if bsk is None:
        bsk = eng.generate_bootstrap_key(
            jax.random.fold_in(jax.random.PRNGKey(0), 2), lwe_sk, glwe_sk)
    jax.block_until_ready(bsk.ggsw_i8)

    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    # DISTINCT ciphertext batch per timed iteration: repeated identical
    # dispatches can be deduplicated relay-side (observed 2026-08-19:
    # a literally-identical repeat run reported an impossible rate).
    iters = 5
    cts = [eng.lwe_encrypt(jax.random.PRNGKey(100 + i), msgs, lwe_sk)
           for i in range(iters)]
    tp = eng.default_test_poly()

    # Warmup/compile
    out = eng.bootstrap_jit(cts[0], bsk, tp)
    jax.block_until_ready(out.a)

    t0 = time.perf_counter()
    outs = [eng.bootstrap_jit(c, bsk, tp) for c in cts]
    jax.block_until_ready([o.a for o in outs])
    dt = time.perf_counter() - t0
    out = outs[0]

    # Correctness check (d2h only after the timed loop)
    if not bsk_was_cached:
        cache.store(eng, 0, bsk)
    dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
    if not np.array_equal(dec, np.asarray(msgs)):
        print(json.dumps({"metric": "pbs_throughput", "value": 0.0,
                          "unit": "bootstraps/s", "vs_baseline": 0.0,
                          "error": "decode mismatch"}))
        return

    rate = batch * iters / dt
    print(json.dumps({
        "metric": "pbs_throughput_n630_N1024",
        "value": round(rate, 1),
        "unit": "bootstraps/s",
        "vs_baseline": round(rate / BASELINE_BOOTSTRAPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
