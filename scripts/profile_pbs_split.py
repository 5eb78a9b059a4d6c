"""Phase-split profiling of the K4 blind rotate on the TPU.

Isolates the three per-step cost components of the mxu-backend PBS to
locate the 38%-MFU plateau (VERDICT r3 next-round #3):

  full      — the production bootstrap (rotate + decompose + Toeplitz
              expand + int8 dot + recombine per step, 630 steps)
  dots_only — 630 chained steps where the digit tensor is a constant
              perturbed by one cheap XOR with the carry (keeps the chain
              honest: every step depends on the previous, relay cannot
              dedup) — measures MXU dot + Toeplitz expansion capability
  novpu     — dots_only minus the Toeplitz expansion (tiles precomputed
              once outside the loop): pure int8 dot ceiling
  vpu_only  — 630 chained steps of rotate + decompose + recombine with
              NO matmul: the VPU/HBM side alone

All timings chained with an 8-byte d2h per iteration (axon relay rules,
docs/OPERATIONS.md).  Run: python scripts/profile_pbs_split.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.bootstrap import TfheEngine, TFHE_BOOT_128_K4
from node_fhe_accelerate_tpu.ops import i8 as i8ops


def timed(fn, args, iters=3, tag=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{tag:12s} min {min(ts)*1e3:8.1f} ms  all "
          f"{[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    return min(ts)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    p = TFHE_BOOT_128_K4()
    eng = TfheEngine(p, ext_backend="mxu")
    from node_fhe_accelerate_tpu.core.keycache import BootstrapKeyCache
    cache = BootstrapKeyCache(".keycache")
    lwe_sk, glwe_sk, bsk = cache.get_or_generate(eng, 0)

    msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
    ct = eng.lwe_encrypt(jax.random.PRNGKey(100), msgs, lwe_sk)
    tp = eng.default_test_poly()
    k, lvl, N, n = p.glwe_dim, p.pbs_level, p.poly_degree, p.n_lwe

    t_full = timed(lambda c: eng.bootstrap_jit(c, bsk, tp), (ct,),
                   tag="full")

    # ---- dots_only: chained scan over the BSK with constant digits ----
    d_const = jnp.ones((batch, lvl, k + 1, N), jnp.int8)

    @jax.jit
    def dots_only(acc0, ggsw):
        def step(acc, g_row):
            d = jnp.bitwise_xor(d_const,
                                (acc[:, None, :1, :1] & 1).astype(jnp.int8))
            t = g_row[..., None, :]
            c = 1
            while c < N:
                t = jnp.concatenate([t, i8ops.roll_last(t, c)], axis=-2)
                c *= 2
            t = t[..., :N]
            out = jax.lax.dot_general(
                d.reshape(batch, -1), t.reshape(-1, (k + 1) * 4 * N),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = out.reshape(batch, k + 1, 4, N)
            res = out[..., 0, :].astype(jnp.uint32)
            for pp in range(1, 4):
                res = res + (out[..., pp, :].astype(jnp.uint32)
                             << jnp.uint32(8 * pp))
            return acc + res, None

        acc, _ = jax.lax.scan(step, acc0, ggsw)
        return acc

    acc0 = jnp.zeros((batch, k + 1, N), jnp.uint32)
    # reshape BSK rows to the dot layout: (n, lvl, k+1, k+1, P, 2N) ->
    # contraction (lvl*(k+1)*N) x ((k+1)*P*N) after expansion
    t_dots = timed(lambda a: dots_only(a, bsk.ggsw_i8), (acc0,),
                   tag="dots_only")

    # ---- novpu: precomputed tiles (no per-step Toeplitz expansion) ----
    @jax.jit
    def expand_all(ggsw):
        t = ggsw[..., None, :]
        c = 1
        while c < N:
            t = jnp.concatenate([t, i8ops.roll_last(t, c)], axis=-2)
            c *= 2
        return t[..., :N]

    try:
        tiles = expand_all(bsk.ggsw_i8)     # (n, lvl, k+1, k+1, P, N, 2N)->N
        jax.block_until_ready(tiles)

        @jax.jit
        def dots_pretiled(acc0, tiles):
            def step(acc, t_row):
                d = jnp.bitwise_xor(d_const,
                                    (acc[:, None, :1, :1] & 1).astype(jnp.int8))
                out = jax.lax.dot_general(
                    d.reshape(batch, -1),
                    t_row.reshape(-1, (k + 1) * 4 * N),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = out.reshape(batch, k + 1, 4, N)
                res = out[..., 0, :].astype(jnp.uint32)
                for pp in range(1, 4):
                    res = res + (out[..., pp, :].astype(jnp.uint32)
                                 << jnp.uint32(8 * pp))
                return acc + res, None

            acc, _ = jax.lax.scan(step, acc0, tiles)
            return acc

        t_pre = timed(lambda a: dots_pretiled(a, tiles), (acc0,),
                      tag="novpu")
    except Exception as e:     # tile tensor is ~GBs; OOM is informative
        print(f"novpu: skipped ({type(e).__name__}: {e})", flush=True)
        t_pre = None

    # ---- vpu_only: rotate + decompose + recombine, no matmul ----
    @jax.jit
    def vpu_only(acc0, rots):
        ring = eng.ring

        def step(acc, rot):
            rotated = ring.rotate(acc, rot[..., None])
            digits = ring.decompose(rotated - acc, p.pbs_base_log, lvl)
            d = jnp.moveaxis(digits, 0, -3).astype(jnp.int8)
            # consume every digit so nothing is dead-code-eliminated
            res = d.astype(jnp.uint32).sum(axis=-3)     # (B, k+1, N)
            return rotated + res, None

        acc, _ = jax.lax.scan(step, acc0, rots)
        return acc

    a_rots = jnp.moveaxis(eng._rotations(ct.a, 1), -1, 0)
    t_vpu = timed(lambda a: vpu_only(a, a_rots), (acc0,), tag="vpu_only")

    macs = n * (lvl * (k + 1) * N) * ((k + 1) * 4 * N) * batch
    print(f"\nbatch={batch}  full={t_full*1e3:.0f}ms "
          f"({batch/t_full:,.0f}/s, {macs/t_full/197e12:.1%} MFU)")
    print(f"dots_only  MFU {macs/t_dots/197e12:.1%}")
    if t_pre:
        print(f"novpu      MFU {macs/t_pre/197e12:.1%}")
    print(f"vpu_only   {t_vpu*1e3:.0f}ms "
          f"({t_vpu/t_full:.0%} of full)")


if __name__ == "__main__":
    main()
