"""Hardware A/B: XLA mxu external product vs fused Pallas CMux backend.

Run on a real TPU chip (axon):  timeout 1200 python scripts/ab_pallas.py
Prints one line per (backend, batch, block_b) with bootstraps/s and a
decode-correctness flag.  No device->host transfer happens before the
timing loops (axon d2h poisoning — docs/OPERATIONS.md).
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
import jax.numpy as jnp                             # noqa: E402
import numpy as np                                  # noqa: E402

jax.devices()
_init.set()
print("platform:", jax.default_backend(), flush=True)

from node_fhe_accelerate_tpu.core.bootstrap import (  # noqa: E402
    TfheEngine, TFHE_BOOT_128_L2)
from node_fhe_accelerate_tpu.core.keycache import BootstrapKeyCache  # noqa: E402

p = TFHE_BOOT_128_L2()
cache = BootstrapKeyCache()
eng = TfheEngine(p, ext_backend="mxu")
lwe_sk, glwe_sk, bsk = cache.load(eng, 0)
was_cached = bsk is not None
if bsk is None:
    bsk = eng.generate_bootstrap_key(
        jax.random.fold_in(jax.random.PRNGKey(0), 2), lwe_sk, glwe_sk)
tp = eng.default_test_poly()

results = []
ITERS = 4
for batch in (4096,):
    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    # DISTINCT ciphertext batch per timed iteration: identical repeated
    # dispatches can be served from a relay-side cache (observed 2026-08-19:
    # a repeat run returned 17M bootstraps/s on literally-identical args).
    cts = [eng.lwe_encrypt(jax.random.PRNGKey(100 + i), msgs, lwe_sk)
           for i in range(ITERS)]
    ct = cts[0]

    configs = ([("mxu", None, None)] +
               [("pallas", bb, v) for v in ("v2", "v1")
                for bb in (64, 128, 32)])
    for backend, bb, variant in configs:
        if backend == "mxu":
            e = eng
        else:
            e = TfheEngine(p, ext_backend="pallas")
            # same ggsw_i8 BSK form drops in; block_b via env-free closure
            import node_fhe_accelerate_tpu.ops.pallas_cmux as pc

            orig = pc.cmux_step_pallas

            def step(acc, rot, ghat2, base_log, interpret=False,
                     block_b=bb, _orig=orig, _v=variant):
                return _orig(acc, rot, ghat2, base_log,
                             interpret=interpret, block_b=block_b,
                             variant=_v)
            pc.cmux_step_pallas = step
        try:
            out = e.bootstrap_jit(ct, bsk, tp)      # compile + warm
            jax.block_until_ready(out.a)
            t0 = time.perf_counter()
            outs = [e.bootstrap_jit(c, bsk, tp) for c in cts]
            jax.block_until_ready([o.a for o in outs])
            dt = (time.perf_counter() - t0) / ITERS
            out = outs[0]
            rate = batch / dt
            row = {"backend": backend, "block_b": bb, "variant": variant,
                   "batch": batch,
                   "bootstraps_per_s": round(rate, 1)}
            print(json.dumps(row), flush=True)
            results.append((row, out))
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"backend": backend, "block_b": bb,
                              "variant": variant,
                              "batch": batch, "error": repr(ex)[:200]}),
                  flush=True)
        finally:
            if backend == "pallas":
                pc.cmux_step_pallas = orig

    # correctness AFTER all timing (d2h)
    for row, out in results:
        if row["batch"] != batch:
            continue
        dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
        row["correct"] = bool(np.array_equal(dec, np.asarray(msgs)))
        print(json.dumps(row), flush=True)
    results = [r for r in results if r[0]["batch"] != batch]

if not was_cached:
    cache.store(eng, 0, bsk)
print("done", flush=True)
