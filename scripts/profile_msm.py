"""Device MSM microbench: correctness vs host Pippenger + warm timing.

Usage: python scripts/profile_msm.py [n ...]   (default 4096 16384)
Compares against the committed zk.csv row (msm_bn254_4096: 1.177s).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from node_fhe_accelerate_tpu.zk.curve import bn254_g1
from node_fhe_accelerate_tpu.ops import limbs as lb


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    c = bn254_g1()
    rng = np.random.default_rng(7)
    for n in sizes:
        svals = [int(s) for s in rng.integers(1, 1 << 62, n)]
        t0 = time.perf_counter()
        pts = c.fixed_base_mul(list(range(1, n + 1)))
        print(f"n={n}: fixed_base_mul {time.perf_counter()-t0:.2f}s")
        limbs = lb.limbs_from_ints(svals, 8)
        t0 = time.perf_counter()
        out = c.msm(limbs, pts)
        jax.block_until_ready(out)
        print(f"n={n}: msm cold (compile) {time.perf_counter()-t0:.2f}s")
        ts = []
        prev = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = c.msm(limbs, pts)
            # force a tiny d2h read: block_until_ready is a no-op on axon
            _ = np.asarray(out[2][:1])
            ts.append(time.perf_counter() - t0)
        print(f"n={n}: msm warm {min(ts)*1e3:.1f} ms "
              f"(all: {[f'{t*1e3:.0f}' for t in ts]})")
        want = c.msm(limbs, pts, backend="host")
        ga = c.to_affine_ints(out)
        wa = c.to_affine_ints(want)
        ok = all(np.array_equal(np.asarray(x), np.asarray(y))
                 for x, y in zip(ga, wa))
        print(f"n={n}: correct vs host oracle: {ok}")


if __name__ == "__main__":
    main()
