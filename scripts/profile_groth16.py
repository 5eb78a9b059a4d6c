"""Phase-split profiling of Groth16 prove on the TPU.

Times each prove phase separately (h-pipeline, G1 MSMs, G2 MSM, host
conversions) to locate the real bottleneck behind the 36.8s/2^12 number
in benchmark_results/zk.csv.  Run: python scripts/profile_groth16.py [log_m]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax_cfg
_jax_cfg.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"))
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import jax

from node_fhe_accelerate_tpu.zk.groth16 import (
    CircuitBuilder, Groth16Prover, Groth16Verifier, R)
from node_fhe_accelerate_tpu.zk.bulletproofs import _scalars, _stack_points
from node_fhe_accelerate_tpu.zk.commitments import _affine_or_none


def main():
    log_m = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    m = 1 << log_m
    t0 = time.perf_counter()
    cb = CircuitBuilder()
    x = cb.public_input()
    w = cb.private_input()
    cur = cb.mul(x, w)
    for _ in range(m - 2):
        cur = cb.mul(cur, w)
    r1cs = cb.build()
    vals = {0: 1, 1: 3, 2: 2}
    acc, wid = 3, 3
    for _ in range(m - 1):
        acc = acc * 2 % R
        vals[wid] = acc
        wid += 1
    print(f"circuit build: {time.perf_counter()-t0:.2f}s  (m={m})")

    prover = Groth16Prover()
    t0 = time.perf_counter()
    setup = prover.setup(r1cs)
    print(f"setup: {time.perf_counter()-t0:.2f}s")

    # warm everything once
    t0 = time.perf_counter()
    proof = prover.prove(setup, vals)
    print(f"prove (cold): {time.perf_counter()-t0:.2f}s")

    # ---- phase split (mirrors Groth16Prover.prove) ----
    from node_fhe_accelerate_tpu.zk.groth16 import evaluate_witness
    c = prover.curve

    def tick(label, fn, n=2):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
                or isinstance(out, (tuple, list)) else None
            ts.append(time.perf_counter() - t0)
        print(f"{label:28s} {min(ts)*1e3:10.1f} ms")
        return out

    t0 = time.perf_counter()
    wit = evaluate_witness(r1cs, vals)
    print(f"evaluate_witness (host):     {(time.perf_counter()-t0)*1e3:10.1f} ms")

    h_limbs = tick("h_limbs (QAP pipeline)", lambda: setup._circuit.h_limbs(wit))
    if jax.default_backend() != "cpu":
        want = setup._circuit._h_limbs_host(wit)
        got = np.asarray(h_limbs)
        print("device h == host h:", np.array_equal(got, want))

    r_s, s_s = 1234567, 7654321
    pts_a = _stack_points([setup.alpha_g1, setup.a_query, setup.delta_g1])
    sc_a = _scalars([1] + wit + [r_s])
    A_pt = tick("A msm (G1, n=m+2)", lambda: c.msm(sc_a, pts_a))

    pts_b1 = _stack_points([setup.beta_g1, setup.b_query_g1, setup.delta_g1])
    sc_b = _scalars([1] + wit + [s_s])
    B_g1 = tick("B msm (G1)", lambda: c.msm(sc_b, pts_b1))

    if jax.default_backend() != "cpu":
        B_g2 = tick("B msm (G2 device)",
                    lambda: prover._b_g2_device(setup, wit, s_s))

    n_pub = r1cs.num_public
    priv_w = wit[n_pub + 1:]
    pieces = [setup.l_query, setup.h_query, A_pt, B_g1, setup.delta_g1]
    sc_tail = _scalars([s_s, r_s, (-r_s * s_s) % R])
    import jax.numpy as jnp
    sc_c = jnp.concatenate([_scalars(priv_w), h_limbs, sc_tail], axis=0)
    pts_c = _stack_points(pieces)
    C_pt = tick("C msm (G1, n=2m+..)", lambda: c.msm(sc_c, pts_c))

    tick("affine fetch A", lambda: _affine_or_none(c, A_pt))
    tick("affine fetch C", lambda: _affine_or_none(c, C_pt))

    t0 = time.perf_counter()
    proof = prover.prove(setup, vals)
    print(f"prove (warm, end-to-end): {time.perf_counter()-t0:.2f}s")
    ok = Groth16Verifier().verify(setup, [3], proof)
    print("verify:", ok)


if __name__ == "__main__":
    main()
