"""Multi-device PBS scaling report: sharded-bootstrap throughput vs mesh size.

Runs the sharded PBS step (parallel/pbs.py — batch over the "data" axis,
BSK replicated) on meshes of 1, 2, 4, 8 devices with a FIXED PER-DEVICE
batch (weak scaling) and writes benchmark_results/scaling.csv.

On real multi-chip hardware this measures ICI scaling efficiency (the
BASELINE.md >=80% target).  On this image only one real TPU chip is
reachable, so by default the report runs on the virtual 8-device CPU mesh
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT) — those devices SHARE host cores,
so absolute throughput is meaningless and "efficiency" reflects partition
overhead only; the point of the artifact is that the sharded program
compiles, executes, decodes correctly, and keeps per-device work constant
at every mesh size.  Run it unchanged on a real slice to get real numbers.

Usage (CPU mesh, from the repo root):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m node_fhe_accelerate_tpu.utils.scaling_report
"""
from __future__ import annotations

import csv
import io
import os
import sys
import time


def _ensure_cpu_mesh():
    import jax
    if not os.environ.get("XLA_FLAGS"):
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # the axon TPU plugin overrides JAX_PLATFORMS; config.update works
    if jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def run(per_device_batch: int = 64, tiny: bool = True) -> str:
    """Returns the scaling CSV text; tiny=True uses a small-but-real TFHE
    shape so the CPU mesh finishes in seconds."""
    _ensure_cpu_mesh()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from ..core.bootstrap import TfheParams, TfheEngine
    from ..parallel.pbs import (
        shard_lwe_batch, replicate_bsk, sharded_bootstrap_fn)

    p = TfheParams(n_lwe=64, poly_degree=256, pbs_base_log=8, pbs_level=2,
                   ks_base_log=4, ks_level=8,
                   lwe_noise_std=64.0, glwe_noise_std=4.0) if tiny \
        else TfheParams()
    eng = TfheEngine(p, ext_backend="mxu")
    key = jax.random.PRNGKey(0)
    lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
    glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
    bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                     lwe_sk, glwe_sk)
    tp = eng.default_test_poly()

    devs = jax.devices()
    rows = []
    base_rate = None
    for d in (1, 2, 4, 8):
        if d > len(devs):
            break
        batch = per_device_batch * d
        mesh = Mesh(np.array(devs[:d]), ("data",))
        msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
        ct = eng.lwe_encrypt(jax.random.PRNGKey(3), msgs, lwe_sk)
        fpbs = sharded_bootstrap_fn(eng, mesh)
        ct_s = shard_lwe_batch(ct, mesh)
        bsk_r = replicate_bsk(bsk, mesh)
        out = fpbs(ct_s, bsk_r, tp)           # compile + warmup
        jax.block_until_ready(out.a)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fpbs(ct_s, bsk_r, tp)
        jax.block_until_ready(out.a)
        dt = (time.perf_counter() - t0) / iters
        rate = batch / dt
        dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
        correct = bool(np.array_equal(dec, np.asarray(msgs)))
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        rows.append((d, batch, rate, eff, correct))
        print(f"devices={d} batch={batch} {rate:,.0f} bootstraps/s "
              f"efficiency={eff:.2f} correct={correct}", flush=True)

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["devices", "batch", "bootstraps_per_s",
                "weak_scaling_efficiency", "correct", "platform"])
    plat = jax.devices()[0].platform
    for d, batch, rate, eff, correct in rows:
        w.writerow([d, batch, f"{rate:.1f}", f"{eff:.3f}", correct, plat])
    return buf.getvalue()


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "benchmark_results")
    text = run()
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "scaling.csv"), "w") as f:
        f.write(text)
    print(f"wrote {os.path.join(outdir, 'scaling.csv')}")


if __name__ == "__main__":
    main()
