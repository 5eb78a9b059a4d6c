"""Hardware A/B: external-product backends for the TFHE blind rotate.

Run on a real TPU chip (axon):  timeout 1200 python scripts/ab_pallas.py
Prints one line per (backend, variant, block_b) with bootstraps/s and a
decode-correctness flag; appends to benchmark_results/ab_pallas_v5e.jsonl
when invoked with --save.

Timing methodology (round 3): each config times a CHAIN of bootstraps —
iteration i+1's input IS iteration i's output — and every iteration is
closed by an 8-byte d2h read.  `jax.block_until_ready` does NOT wait on
the axon relay (measured 2026-08-19), and independent dispatches can be
deduplicated relay-side; the chain + forced read defeats both.  The final
decode check only passes if every hop computed a real bootstrap.
"""
import json
import sys
import os
import time
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_init = threading.Event()


def _watchdog(limit=300.0):
    if not _init.wait(limit):
        print(json.dumps({"error": "device init timed out (tunnel down?)"}))
        os._exit(2)


threading.Thread(target=_watchdog, daemon=True).start()

import jax                                          # noqa: E402
import numpy as np                                  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp                             # noqa: E402

jax.devices()
_init.set()
print("platform:", jax.default_backend(),
      "device:", jax.devices()[0].device_kind, flush=True)

from node_fhe_accelerate_tpu.core.bootstrap import (  # noqa: E402
    TfheEngine, TFHE_BOOT_128_L2)
from node_fhe_accelerate_tpu.core.keycache import BootstrapKeyCache  # noqa: E402

SAVE = "--save" in sys.argv
ITERS = int(os.environ.get("AB_ITERS", "3"))
BATCHES = tuple(int(b) for b in
                os.environ.get("AB_BATCHES", "4096").split(","))

p = TFHE_BOOT_128_L2()
cache = BootstrapKeyCache()
eng = TfheEngine(p, ext_backend="mxu")
lwe_sk, glwe_sk, bsk = cache.load(eng, 0)
was_cached = bsk is not None
if bsk is None:
    bsk = eng.generate_bootstrap_key(
        jax.random.fold_in(jax.random.PRNGKey(0), 2), lwe_sk, glwe_sk)
tp = eng.default_test_poly()

rows = []
for batch in BATCHES:
    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    ct0 = eng.lwe_encrypt(jax.random.PRNGKey(100), msgs, lwe_sk)

    default_cfg = ("mxu,pallas:64:v1,"
                   "fused:64:2,fused:128:2,fused:128:4,fused:256:4,"
                   "fused:128:8")
    cfg_env = os.environ.get("AB_CONFIGS", default_cfg)
    configs = []
    for tok in cfg_env.split(","):
        parts = tok.split(":")
        configs.append((parts[0],
                        int(parts[1]) if len(parts) > 1 else None,
                        parts[2] if len(parts) > 2 else None))
    for backend, bb, variant in configs:
        if backend == "mxu":
            e = eng
        elif backend == "fused":
            e = TfheEngine(p, ext_backend="pallas_fused")
            import node_fhe_accelerate_tpu.ops.pallas_cmux as pc
            orig = pc.blind_rotate_fused

            def rot(acc, a_rots, g, base_log, interpret=False,
                    block_b=bb, chunks=int(variant), _orig=orig):
                return _orig(acc, a_rots, g, base_log, interpret=interpret,
                             block_b=block_b, chunks=chunks)
            pc.blind_rotate_fused = rot
            # the engine binds the module function at call time via the
            # local import in blind_rotate, so the patch takes effect
        else:
            e = TfheEngine(p, ext_backend="pallas")
            import node_fhe_accelerate_tpu.ops.pallas_cmux as pc
            orig = pc.cmux_step_pallas

            def step(acc, rot, ghat2, base_log, interpret=False,
                     block_b=bb, _orig=orig, _v=variant):
                return _orig(acc, rot, ghat2, base_log,
                             interpret=interpret, block_b=block_b,
                             variant=_v)
            pc.cmux_step_pallas = step
        try:
            ct = e.bootstrap_jit(ct0, bsk, tp)      # compile + warm
            np.asarray(ct.b[:2])                    # force warmup execution
            times = []
            t_all = time.perf_counter()
            for _ in range(ITERS):                  # chained + forced d2h
                t0 = time.perf_counter()
                ct = e.bootstrap_jit(ct, bsk, tp)
                np.asarray(ct.b[:2])
                times.append(round(time.perf_counter() - t0, 4))
            dt = (time.perf_counter() - t_all) / ITERS
            dec = np.asarray(e.lwe_decrypt(ct, lwe_sk))
            row = {"backend": backend, "block_b": bb, "variant": variant,
                   "batch": batch,
                   "bootstraps_per_s": round(batch / dt, 1),
                   "iter_s": times,
                   "correct": bool(np.array_equal(dec, np.asarray(msgs)))}
            print(json.dumps(row), flush=True)
            rows.append(row)
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"backend": backend, "block_b": bb,
                              "variant": variant, "batch": batch,
                              "error": repr(ex)[:300]}), flush=True)
            rows.append({"backend": backend, "block_b": bb,
                         "variant": variant, "batch": batch,
                         "error": repr(ex)[:300]})
        finally:
            if backend == "pallas":
                pc.cmux_step_pallas = orig
            elif backend == "fused":
                pc.blind_rotate_fused = orig

if not was_cached:
    cache.store(eng, 0, bsk)
if SAVE:
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmark_results",
        "ab_pallas_v5e.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                            "device": jax.devices()[0].device_kind,
                            "iters": ITERS, "note":
                            "chained+forced-d2h timing (round 3)"}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
print("done", flush=True)
