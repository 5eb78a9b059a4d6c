"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: TFHE programmable-bootstrap throughput at 128-bit security
(n=630 LWE; GLWE lattice dimension k*N = 1024 — the reference's TFHE_128
hardness, parameter_set.cpp:108-137) with the level-2 gadget (Bg=2^8,
l=2), the MXU-optimal k=4/N=256 GLWE geometry (TFHE_BOOT_128_K4 —
2.56x fewer MACs than k=1/N=1024 at the same Module-LWE hardness; see
its docstring for the noise analysis), and the auto-selected
external-product backend (ops/pallas_cmux.py fused CMux kernel with
precomputed Toeplitz tiles on TPU; XLA int8 MXU path elsewhere).
The reference-shape k=1/N=1024 row lives in the committed suite
(utils/bench_suite.py) next to this one.

vs_baseline = bootstraps/s / 50: the reference's only bootstrap anchor is
its "<20 ms per bootstrap" README claim on M4 Max (README.md:75,
BASELINE.md), i.e. ~50 bootstraps/s/machine.

Anti-gaming hardening (round 3, after BENCH_r02 recorded a physically
impossible 31.35M/s through relay-side dispatch deduplication):

1. **Chained iterations.** The timed loop bootstraps its OWN OUTPUT:
   iteration i+1's LWE input IS iteration i's result (the identity-LUT
   bootstrap maps LWE(m) -> LWE(m) of the same shape).  Every dispatch
   therefore has a data dependency on the previous one — no relay, cache,
   or dedup layer can skip, coalesce, or parallelize them — and the final
   decode check only passes if every link in the chain computed a real
   bootstrap (fresh noise each hop, message preserved).
2. **Per-iteration wall times** (stderr), each closed by an 8-byte
   device->host read of that iteration's output: on the axon relay
   `jax.block_until_ready` returns immediately WITHOUT waiting for the
   computation (measured 2026-08-19: 0.1 ms "iterations" at batch 4096),
   so only a d2h of the result actually forces execution.  A skipped
   iteration would show up as a ~0 entry; honest runs show near-equal
   times.
3. **Physical plausibility guard.** One bootstrap at this shape costs
   n * (l*(k+1)*N) * ((k+1)*4*N) int8 MACs on the MXU path
   (8.26 GMAC at n=630, N=256, k=4, l=2; 21.1 at the k=1/N=1024 shape).  The guard computes the
   device's int8 peak (device_kind table below) and REFUSES to print any
   rate above ceiling = peak_MACs/s / MACs_per_bootstrap (~23.8K/s on one
   v5e at the k=4 geometry) — an impossible number now exits 2 with an error JSON instead of
   becoming the round's artifact.

The run is honest end-to-end: real BSK keygen, real LWE encrypt, timed
jitted chained bootstraps over a batch of 4096, and a full
decode-correctness check against the plaintexts AFTER timing (any
device->host transfer before the loop would poison the axon dispatch
path — see docs/OPERATIONS.md).

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
            "metric": "pbs_throughput_tfhe128_n630_kN1024", "value": 0.0,
            "unit": "bootstraps/s", "vs_baseline": 0.0,
            "error": f"device init exceeded {limit_s:.0f}s — axon tunnel "
                     "down (jax.devices() hang)",
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

from node_fhe_accelerate_tpu.core.bootstrap import TfheEngine, TFHE_BOOT_128_K4

BASELINE_BOOTSTRAPS_PER_SEC = 50.0  # M4 Max, <20ms/bootstrap (README.md:75)

# Peak int8 MAC/s by TPU generation (one MAC = 2 ops; vendor peaks are
# quoted in int8 OPS: v4 275T, v5e 394T, v5p 918T, v6e 1836T).  Unknown
# device kinds take the table max so the guard can never false-positive.
_INT8_PEAK_MACS = {
    "v4": 137.5e12,
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6 lite": 918e12, "v6e": 918e12, "v6": 918e12,
}


def _int8_peak_macs(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in sorted(_INT8_PEAK_MACS.items(),
                            key=lambda kv: -len(kv[0])):
        if tag in kind:
            return peak
    return max(_INT8_PEAK_MACS.values())


def macs_per_bootstrap(p) -> float:
    """int8 MACs of one MXU-path bootstrap: n blind-rotate steps, each a
    (l*(k+1)*N) x ((k+1)*P*N) contraction with P=4 digit planes."""
    k1 = p.glwe_dim + 1
    return float(p.n_lwe) * (p.pbs_level * k1 * p.poly_degree) * \
        (k1 * 4 * p.poly_degree)


def main():
    batch = 4096
    p = TFHE_BOOT_128_K4()
    eng = TfheEngine(p)   # auto backend: fused Pallas CMux on TPU

    dev = jax.devices()[0]
    ceiling = _int8_peak_macs(dev) / macs_per_bootstrap(p)

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
    bsk_raw = bsk
    # one-time Toeplitz tile precompute — keeps the per-step expansion off
    # the blind-rotate critical path (core/bootstrap.py prepare_bsk;
    # +5.6% measured on v5e, and the tiles live with the key)
    bsk = eng.prepare_bsk(bsk)
    jax.block_until_ready(bsk.ggsw_i8)

    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    ct = eng.lwe_encrypt(jax.random.PRNGKey(100), msgs, lwe_sk)
    tp = eng.default_test_poly()

    # Warmup/compile (the chained loop re-enters this same executable:
    # bootstrap output and input are both n-dim LWE batches).  The 8-byte
    # d2h is what actually forces completion — block_until_ready is a
    # no-op on the axon relay (see module docstring).
    ct = eng.bootstrap_jit(ct, bsk, tp)
    np.asarray(ct.b[:2])

    # Timed CHAINED loop: each input is the previous output, and each
    # iteration is closed by a tiny d2h read of its output (full-chain
    # data dependency + forced execution; the 8-byte transfer is
    # negligible vs the ~1 s of compute per iteration).
    iters = 5
    times = []
    t_total0 = time.perf_counter()
    for _ in range(iters):
        t0 = time.perf_counter()
        ct = eng.bootstrap_jit(ct, bsk, tp)
        np.asarray(ct.b[:2])
        times.append(time.perf_counter() - t0)
    dt = time.perf_counter() - t_total0

    # Correctness check (d2h only after the timed loop).  The identity
    # LUT preserves the message, so the decode only passes if every
    # chained hop performed a real bootstrap.
    if not bsk_was_cached:
        cache.store(eng, 0, bsk_raw)
    dec = np.asarray(eng.lwe_decrypt(ct, lwe_sk))
    if not np.array_equal(dec, np.asarray(msgs)):
        print(json.dumps({"metric": "pbs_throughput_tfhe128_n630_kN1024",
                          "value": 0.0, "unit": "bootstraps/s",
                          "vs_baseline": 0.0,
                          "error": "decode mismatch after chained loop"}))
        sys.exit(1)

    rate = batch * iters / dt
    mfu = rate * macs_per_bootstrap(p) / _int8_peak_macs(dev)
    print(f"device={dev.device_kind!r} backend={eng.backend} "
          f"batch={batch} iters={iters} "
          f"per-iter times: {[round(t, 4) for t in times]} "
          f"ceiling={ceiling:.1f}/s int8-MFU={mfu:.1%}",
          file=sys.stderr, flush=True)

    if rate > ceiling:
        print(json.dumps({
            "metric": "pbs_throughput_tfhe128_n630_kN1024", "value": 0.0,
            "unit": "bootstraps/s", "vs_baseline": 0.0,
            "error": f"implausible rate {rate:.1f}/s exceeds the device's "
                     f"int8-peak ceiling {ceiling:.1f}/s "
                     f"({macs_per_bootstrap(p) / 1e9:.1f} GMAC/bootstrap on "
                     f"{dev.device_kind}) — measurement rejected",
        }), flush=True)
        sys.exit(2)

    print(json.dumps({
        "metric": "pbs_throughput_tfhe128_n630_kN1024",
        "value": round(rate, 1),
        "unit": "bootstraps/s",
        "vs_baseline": round(rate / BASELINE_BOOTSTRAPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
