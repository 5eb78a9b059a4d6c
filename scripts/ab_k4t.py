"""Hardware A/B: TFHE_BOOT_128_K4 vs TFHE_BOOT_128_K4T (truncated BSK).

VERDICT r4 next-round #2: validate the K4T approximate-gadget preset on
real hardware at production shape with REAL noise — chained iterations
(each input is the previous output, so no dispatch can be deduplicated),
per-iteration d2h forcing, full decode check, and a MEASURED output
noise margin (max |phase error| vs the Delta/2 decode margin), not just
the derived bound in TFHE_BOOT_128_K4T's docstring.

Writes/updates the `pbs_n630_N256_l2_k4t` row in
benchmark_results/bootstrap.csv and refreshes dispatch_pbs.json if K4T
beats the recorded winner.

Usage:  python scripts/ab_k4t.py [--iters 5] [--batch 4096]
"""
import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.bootstrap import (
    TfheEngine, TFHE_BOOT_128_K4, TFHE_BOOT_128_K4T)
from node_fhe_accelerate_tpu.core.keycache import BootstrapKeyCache


def run_preset(tag, params, batch, iters, warmup=2):
    eng = TfheEngine(params, ext_backend="mxu")
    cache = BootstrapKeyCache(os.path.join(_REPO, ".keycache"))
    t0 = time.perf_counter()
    lwe_sk, glwe_sk, bsk = cache.get_or_generate(eng, 0)
    print(f"[{tag}] BSK ready in {time.perf_counter() - t0:.1f}s "
          f"(i8 planes={bsk.ggsw_i8.shape[-2]})", flush=True)

    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    ct = eng.lwe_encrypt(jax.random.PRNGKey(100), msgs, lwe_sk)
    tp = eng.default_test_poly()

    # warmup/compile (chained: output shape == input shape)
    for _ in range(warmup):
        ct = eng.bootstrap_jit(ct, bsk, tp)
    np.asarray(ct.b[:2])

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ct = eng.bootstrap_jit(ct, bsk, tp)
        np.asarray(ct.b[:2])          # d2h forces completion (axon relay)
        times.append(time.perf_counter() - t0)

    # decode check + MEASURED noise margin on the final chained output
    phase = np.asarray(eng.lwe_phase(ct, lwe_sk)).astype(np.uint32)
    t = params.plaintext_modulus
    delta = np.uint64(2 ** 32 // t)
    err = ((phase.astype(np.int64)
            - np.asarray(msgs).astype(np.int64) * int(delta)
            + 2 ** 31) % 2 ** 32) - 2 ** 31
    dec = np.asarray(eng.lwe_decrypt(ct, lwe_sk))
    correct = bool(np.array_equal(dec, np.asarray(msgs)))
    margin = int(delta) // 2
    rate = batch * len(times) / sum(times)
    res = {
        "tag": tag, "backend": "tpu-mxu", "batch": batch, "iters": iters,
        "times_s": [round(x, 4) for x in times],
        "mean_us": 1e6 * float(np.mean(times)),
        "stddev_us": 1e6 * float(np.std(times, ddof=1)),
        "throughput_ops_s": round(rate, 1),
        "correct": correct,
        "noise_abs_max": int(np.abs(err).max()),
        "noise_std": float(np.std(err)),
        "decode_margin": margin,
        "margin_bits_spare": float(np.log2(margin / max(np.abs(err).max(), 1))),
    }
    print(json.dumps(res), flush=True)
    return res


def update_csv(res, name):
    path = os.path.join(_REPO, "benchmark_results", "bootstrap.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
        fields = rows[0].keys() if rows else []
    floor_us = 32589.35  # committed dispatch-floor estimate (memory.csv)
    new = {k: "" for k in fields}
    new.update({
        "name": name, "backend": res["backend"], "size": str(res["batch"]),
        "batch": str(res["batch"]), "mean_us": f"{res['mean_us']:.2f}",
        "stddev_us": f"{res['stddev_us']:.2f}",
        "throughput_ops_s": f"{res['throughput_ops_s']:.1f}",
        "speedup_vs_baseline": f"{res['throughput_ops_s'] / 50.0:.2f}",
        "correct": str(res["correct"]), "unit": "op/s",
        "mean_minus_floor_us": f"{res['mean_us'] - floor_us:.2f}",
        "proof_bytes": "0",
    })
    rows = [r for r in rows if not (r["name"] == name
                                    and r["backend"] == res["backend"])]
    rows.append(new)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(fields))
        w.writeheader()
        w.writerows(rows)
    print(f"updated {path}: {name}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    k4 = run_preset("k4", TFHE_BOOT_128_K4(), args.batch, args.iters)
    k4t = run_preset("k4t", TFHE_BOOT_128_K4T(), args.batch, args.iters)

    update_csv(k4, "pbs_n630_N256_l2_k4")
    update_csv(k4t, "pbs_n630_N256_l2_k4t")

    if k4t["correct"] and k4t["throughput_ops_s"] > k4["throughput_ops_s"]:
        print(f"K4T wins: {k4t['throughput_ops_s']:.0f}/s vs "
              f"{k4['throughput_ops_s']:.0f}/s "
              f"(+{100 * (k4t['throughput_ops_s'] / k4['throughput_ops_s'] - 1):.1f}%), "
              f"margin spare {k4t['margin_bits_spare']:.1f} bits", flush=True)
    else:
        print("K4T does NOT win (or failed decode) — keep K4", flush=True)


if __name__ == "__main__":
    main()
