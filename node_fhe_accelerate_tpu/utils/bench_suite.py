"""Comprehensive benchmark suite: timings, statistics, CSV/JSON export.

Twin of the reference's `ComprehensiveBenchmarkRunner`
(cpp/include/comprehensive_benchmark.h:313-429, with the same CSV column
schema its reports use: name, backend, mean_us, stddev_us, throughput,
speedup, correct) and its `StatisticalAnalyzer` (:141-186) /
`BenchmarkTimer` (:271-300).

Suites: modmul, ntt, poly_mul, bootstrap, tally pipeline.  Every result
carries a `correct` flag verified against the big-int oracle (Property 14:
backend equivalence — the accelerated path must match the scalar truth),
and `speedup_vs_baseline` computed against the reference's measured M4 Max
numbers (BASELINE.md) where one exists for the same op/shape.

This suite is the SINGLE source of truth for committed benchmark
artifacts: `python -m node_fhe_accelerate_tpu.utils.bench_suite` runs it
and rewrites benchmark_results/*.csv + benchmark_results.json.  The
driver-facing bench.py headline (PBS throughput at the production shape)
is the `pbs_n630_N1024_l2` row of the bootstrap suite — same engine, same
shape, same batch.

Conditions that matter for reproducing the numbers (recorded per row in
the `batch` column): throughput scales with batch until HBM pressure;
NTT-1024 peaks around batch 8192 (~1.5M ntt/s on v5e), PBS at batch 4096
(~3.2K bootstraps/s with the level-2 gadget).  All timings are steady-state
jitted dispatches (compile excluded), q = 2^40-2^32+1 for the 64-bit ring
suites, torus 2^32 for TFHE.
"""
from __future__ import annotations

import csv
import io
import json
import math
import os
import time
from dataclasses import dataclass, asdict

import numpy as np
import jax

__all__ = ["BenchmarkResult", "StatisticalAnalyzer", "BenchmarkTimer",
           "ComprehensiveBenchmarkRunner", "force_execution"]


# Reference (M4 Max) throughputs from BASELINE.md, ops/sec, keyed by row
# name.  Rows without an entry have no reference measurement (vs_baseline
# left at 0.0 and explained in the README).
_BASELINES = {
    "modmul_batch_1024": 564_000.0,      # Barrett 4x, BENCHMARK_REPORT.md:31
    "modmul_batch_16384": 37_200.0,      # BENCHMARK_REPORT.md:58
    "modmul_batch_65536": 8_750.0,       # BENCHMARK_REPORT.md:72-84
    "ntt_forward_1024": 116_500.0,       # AMX matrix NTT, :86-97
    "ntt_forward_4096": 25_200.0,        # SME tile NTT, :99-110
    "ntt_forward_16384": 5_370.0,        # :112-123
    "poly_mul_1024": 47_100.0,           # NTT-based, :125-131
    "poly_mul_4096": 10_300.0,           # :133-139
    "pbs_n630_N1024_l2": 50.0,           # <20ms/bootstrap, README.md:75
    "pbs_n630_N1024_l3": 50.0,
    "pbs_n630_N256_l2_k4": 50.0,         # security-equivalent kN=1024
    # Reference README proof-system targets (README.md:82-84, BASELINE.md):
    # BP <50ms gen / <5ms verify; PLONK <150ms gen / <5ms verify.
    "bp_range_prove_64": 1.0 / 0.050,
    "bp_range_verify_64": 1.0 / 0.005,
    "plonk_prove": 1.0 / 0.150,
    "plonk_verify": 1.0 / 0.005,
    "groth16_prove_2e12": 1.0 / 0.100,   # Groth16 <100ms gen, README.md:83
    "groth16_prove_2e14": 1.0 / 0.100,
    "groth16_prove_2e16": 1.0 / 0.100,
    "groth16_verify_2e12": 1.0 / 0.001,  # Groth16 <1ms verify, README.md:83
    "groth16_verify_2e14": 1.0 / 0.001,
    "groth16_verify_2e16": 1.0 / 0.001,
    # Reference README hom-mul claim (README.md:754): <50 ms -> 20 mul/s.
    # (The reference never computes CKKS; its preset is BFV-on-one-modulus.)
    "ckks_mul_relin_rescale_N16384": 20.0,
    # Reference README voting-scale claim (README.md:756): 10k ballots/s.
    # Aspirational anchor for the end-to-end submit path (encrypt + BP
    # validity + Groth16 eligibility) — the reference never measures it.
    "ballot_submit_depth20": 10_000.0,
    # Memory-suite analog (comprehensive_benchmark.cpp memory benchmarks):
    # 16 MB cache-aligned copy, 212.55 us (BENCHMARK_REPORT.md:209-217)
    # -> bytes/s.
    "d2h_16mb": 16 * 1024 * 1024 / 212.55e-6,
    "h2d_16mb": 16 * 1024 * 1024 / 212.55e-6,
}


@dataclass
class BenchmarkResult:
    suite: str
    name: str
    backend: str
    size: int
    batch: int
    mean_us: float
    stddev_us: float
    throughput_ops_s: float
    speedup_vs_baseline: float
    correct: bool
    # What one "op" means for throughput_ops_s (VERDICT r3 weak #6: rows
    # without defined units are not auditable): e.g. "bootstrap/s",
    # "mul/s" (one leveled multiply), "bytes/s", "proof/s".
    unit: str = "op/s"
    # mean_us minus the measured per-dispatch floor (VERDICT r3 weak #4:
    # small-shape rows are floor artifacts; this column separates device
    # capability from relay latency).  -1 = floor not measured.
    mean_minus_floor_us: float = -1.0
    proof_bytes: int = 0     # serialized proof size, proof rows only


class StatisticalAnalyzer:
    """mean/stddev/significance (comprehensive_benchmark.h:141-186)."""

    @staticmethod
    def analyze(samples_s: list) -> tuple:
        n = len(samples_s)
        mean = sum(samples_s) / n
        var = sum((s - mean) ** 2 for s in samples_s) / max(n - 1, 1)
        return mean, math.sqrt(var)

    @staticmethod
    def significantly_faster(a: list, b: list, z: float = 2.0) -> bool:
        """Welch-style z-test: is a faster than b with confidence."""
        ma, sa = StatisticalAnalyzer.analyze(a)
        mb, sb = StatisticalAnalyzer.analyze(b)
        denom = math.sqrt(sa ** 2 / len(a) + sb ** 2 / len(b)) or 1e-12
        return (mb - ma) / denom > z


def force_execution(out):
    """Force the dispatched computation to actually COMPLETE.

    On the axon TPU relay `jax.block_until_ready` returns immediately
    without waiting (measured 2026-08-19: 0.1 ms "iterations" for ~1.1 s
    bootstrap programs); only a device->host transfer forces execution.
    Fetch one element of the first array leaf — a few bytes, negligible
    against any timed workload."""
    leaves = [x for x in jax.tree_util.tree_leaves(out) if x is not None]
    if not leaves:
        return
    leaf = leaves[0]
    if getattr(leaf, "ndim", 0) > 0:
        leaf = leaf.reshape(-1)[:1]
    np.asarray(leaf)


class BenchmarkTimer:
    """Warmup + timed iterations over a jitted thunk.  Every iteration is
    closed by `force_execution` (tiny d2h) — block_until_ready alone does
    NOT wait on the axon relay, which is how round 2's driver benchmark
    recorded a physically impossible rate (BENCH_r02, VERDICT.md)."""

    def __init__(self, warmup: int = 2, iters: int = 5):
        self.warmup = warmup
        self.iters = iters

    def run(self, thunk) -> list:
        """`thunk` may optionally take the iteration index — benches use it
        to feed DISTINCT inputs per timed iteration, since repeated
        literally-identical dispatches can be deduplicated relay-side
        (observed 2026-08-19 on axon: an identical repeat run reported an
        impossible rate)."""
        import inspect
        takes_i = len(inspect.signature(thunk).parameters) >= 1
        call = (lambda i: thunk(i)) if takes_i else (lambda i: thunk())
        for w in range(self.warmup):
            out = call(w % max(self.iters, 1))
        force_execution(out)
        samples = []
        for i in range(self.iters):
            t0 = time.perf_counter()
            out = call(i)
            force_execution(out)
            samples.append(time.perf_counter() - t0)
        return samples


class ComprehensiveBenchmarkRunner:
    """(comprehensive_benchmark.h:400 run_full_suite)"""

    def __init__(self, warmup: int = 2, iters: int = 5):
        self.timer = BenchmarkTimer(warmup, iters)
        self.results: list[BenchmarkResult] = []

    # -- suites --------------------------------------------------------------
    def benchmark_modmul(self, sizes=(1024, 16384, 65536)):
        from ..ops.modular import ModCtx, mod_mul_np
        from ..ops.u64 import u64_from_np, u64_to_np
        from ..core.params import Primes

        q = Primes.Q_40_1
        ctx = ModCtx(q)
        mul = jax.jit(ctx.mul)
        for n in sizes:
            rng = np.random.default_rng(n)
            a = rng.integers(0, q, n, dtype=np.uint64)
            b = rng.integers(0, q, n, dtype=np.uint64)
            ap, bp = u64_from_np(a), u64_from_np(b)
            samples = self.timer.run(lambda: mul(ap, bp))
            correct = bool(np.array_equal(u64_to_np(mul(ap, bp)),
                                          mod_mul_np(a, b, q)))
            self._record("modmul", f"modmul_batch_{n}", "tpu-vpu", n,
                         samples, n, correct, batch=n)

    def benchmark_ntt(self, degrees=(1024, 4096, 16384), batch: int = 8192):
        from ..ops.ntt import NTTContext
        from ..ops.u64 import u64_from_np
        from ..core.params import Primes

        for n in degrees:
            # keep the working set ~constant: 8192 rows at N=1024 ->
            # 512 rows at N=16384 (HBM pressure flattens throughput far
            # below these sizes anyway; batch is recorded per row)
            batch = max(256, (8192 * 1024) // n)
            q = Primes.Q_40_1 if n <= (1 << 31) else Primes.Q_60_1
            ntt = NTTContext(n, q)
            fwd = jax.jit(ntt.forward)
            rng = np.random.default_rng(n)
            a = rng.integers(0, q, (batch, n), dtype=np.uint64)
            planes = u64_from_np(a)
            samples = self.timer.run(lambda: fwd(planes))
            # correctness: round-trip one row
            from ..ops.u64 import u64_to_np
            inv = jax.jit(ntt.inverse)
            rt = u64_to_np(inv(fwd(u64_from_np(a[0]))))
            self._record("ntt", f"ntt_forward_{n}", "tpu-vpu", n, samples,
                         batch, bool(np.array_equal(rt, a[0])), batch=batch)

    def benchmark_poly_mul(self, degrees=(1024,), batch: int = 2048):
        from ..ops.ntt import NTTContext, negacyclic_mul_np
        from ..ops.u64 import u64_from_np, u64_to_np
        from ..core.params import Primes

        q = Primes.Q_40_1
        for n in degrees:
            ntt = NTTContext(n, q)
            mul = jax.jit(ntt.negacyclic_mul)
            rng = np.random.default_rng(n)
            a = rng.integers(0, q, (batch, n), dtype=np.uint64)
            b = rng.integers(0, q, (batch, n), dtype=np.uint64)
            ap, bp = u64_from_np(a), u64_from_np(b)
            samples = self.timer.run(lambda: mul(ap, bp))
            got = u64_to_np(mul(u64_from_np(a[0]), u64_from_np(b[0])))
            ok = bool(np.array_equal(got, negacyclic_mul_np(a[0], b[0], q)))
            self._record("poly_mul", f"poly_mul_{n}", "tpu-vpu", n, samples,
                         batch, ok, batch=batch)

    def benchmark_bootstrap(self, batch: int = 4096, production: bool = True):
        """TFHE PBS at the PRODUCTION shape (n=630, N=1024, k=1 — the
        reference's TFHE_128 geometry) on the MXU external-product
        backend, both gadget presets.  This is the row bench.py's headline
        reproduces.  Set production=False for a tiny smoke shape."""
        from ..core.bootstrap import (
            TfheParams, TfheEngine, TFHE_BOOT_128, TFHE_BOOT_128_L2,
            TFHE_BOOT_128_K4)
        import jax.numpy as jnp

        presets = ([("l2_k4", TFHE_BOOT_128_K4()),
                    ("l2", TFHE_BOOT_128_L2()), ("l3", TFHE_BOOT_128())]
                   if production else
                   [("tiny", TfheParams(
                       n_lwe=16, poly_degree=256, pbs_base_log=7,
                       pbs_level=3, ks_base_log=4, ks_level=8,
                       lwe_noise_std=0.0, glwe_noise_std=0.0))])
        if not production:
            batch = 8
        from ..core.keycache import BootstrapKeyCache
        cache = BootstrapKeyCache()
        for tag, p in presets:
            eng = TfheEngine(p, ext_backend="mxu")
            key = jax.random.PRNGKey(0)
            # disk-cached BSK (store deferred to after the timing run: the
            # serialization d2h must not precede timed dispatches on axon)
            lwe_sk, glwe_sk, bsk = cache.load(eng, 0)
            bsk_was_cached = bsk is not None
            if bsk is None:
                bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                                 lwe_sk, glwe_sk)
            msgs = jnp.arange(batch, dtype=jnp.uint32) % 2
            cts = [eng.lwe_encrypt(jax.random.PRNGKey(100 + i), msgs, lwe_sk)
                   for i in range(self.timer.iters)]
            ct = cts[0]
            tp = eng.default_test_poly()
            samples = self.timer.run(
                lambda i: eng.bootstrap_jit(cts[i], bsk, tp))
            out = eng.bootstrap_jit(ct, bsk, tp)
            if not bsk_was_cached:
                cache.store(eng, 0, bsk)
            dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
            correct = bool(np.array_equal(dec, np.asarray(msgs)))
            self._record(
                "bootstrap", f"pbs_n{p.n_lwe}_N{p.poly_degree}_{tag}",
                "tpu-mxu", batch, samples, batch, correct, batch=batch)
            if production and p.poly_degree % 128 == 0 \
                    and jax.default_backend() != "cpu":
                # fused Pallas CMux backend (the production default on
                # TPU) — consumes the same ggsw_i8 BSK form, so the
                # cached key drops in unchanged; prepare_bsk precomputes
                # the Toeplitz tiles as production does
                eng_pl = TfheEngine(p, ext_backend="pallas")
                bsk_t = eng_pl.prepare_bsk(bsk)
                samples = self.timer.run(
                    lambda i, e=eng_pl: e.bootstrap_jit(cts[i], bsk_t, tp))
                out = eng_pl.bootstrap_jit(ct, bsk_t, tp)
                dec = np.asarray(eng_pl.lwe_decrypt(out, lwe_sk))
                correct = bool(np.array_equal(dec, np.asarray(msgs)))
                self._record(
                    "bootstrap", f"pbs_n{p.n_lwe}_N{p.poly_degree}_{tag}",
                    "tpu-pallas", batch, samples, batch, correct,
                    batch=batch)

    def benchmark_bootstrap_tfhe256(self, batch: int = 256):
        """PBS at the TFHE_256_SECURE polynomial geometry (N=4096, l=3,
        Bg=2^10 — parameter_set.cpp:166-191) on the dual-prime CRT
        external-product backend (the gadget overflows both the int8 MXU
        bound and the single 54-bit prime).  Opt-in from run_full_suite via
        NFA_BENCH_TFHE256=1: BSK keygen at this shape is minutes-scale on
        first run (disk-cached afterwards)."""
        from ..core.bootstrap import TfheParams, TfheEngine
        import jax.numpy as jnp
        p = TfheParams(n_lwe=1024, poly_degree=4096, glwe_dim=1,
                       pbs_base_log=10, pbs_level=3,
                       ks_base_log=4, ks_level=8,
                       lwe_noise_std=2.0 ** 10, glwe_noise_std=2.0 ** 4,
                       plaintext_modulus=16)
        from ..core.keycache import BootstrapKeyCache
        cache = BootstrapKeyCache()
        eng = TfheEngine(p, ext_backend="crt")
        lwe_sk, glwe_sk, bsk = cache.load(eng, 0)
        bsk_was_cached = bsk is not None
        if bsk is None:
            key = jax.random.PRNGKey(0)
            bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                             lwe_sk, glwe_sk)
        msgs = jnp.arange(batch, dtype=jnp.uint32) % 8
        ct = eng.lwe_encrypt(jax.random.PRNGKey(3), msgs, lwe_sk)
        tp = eng.default_test_poly()
        samples = self.timer.run(lambda: eng.bootstrap_jit(ct, bsk, tp))
        out = eng.bootstrap_jit(ct, bsk, tp)
        if not bsk_was_cached:
            cache.store(eng, 0, bsk)
        dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
        correct = bool(np.array_equal(dec, np.asarray(msgs)))
        self._record("bootstrap", "pbs_n1024_N4096_l3_tfhe256",
                     "tpu-crt", batch, samples, batch, correct, batch=batch)

    def benchmark_zk(self, log_constraints: int = 12, msm_points: int = 4096,
                     msm: bool = True):
        """ZK proving scale: Groth16 prove over a 2^log_constraints-gate
        multiplication chain (device NTT QAP + Pippenger MSMs) and a raw
        BN254 MSM.  `correct` = the proof verifies under the real pairing /
        the MSM matches a host windowed-double-and-add oracle.  Reference
        analog: zk_hardware_accel.h AMXConstraintEvaluator + Pippenger
        (zk_elliptic_curve.h:193-254); the reference never benchmarks
        proving at scale because its host QAP math is O(m^2)."""
        from ..zk.groth16 import (
            CircuitBuilder, Groth16Prover, Groth16Verifier, R)
        from ..zk.bulletproofs import _scalars
        from ..zk.curve import bn254_g1

        m = 1 << log_constraints
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
        prover = Groth16Prover()
        setup = prover.setup(r1cs)
        proof = prover.prove(setup, vals)        # warm the jitted paths
        # prove() ends in host fetches, so it is synchronous by construction;
        # return a scalar so the timer's block_until_ready is a no-op.
        samples = self.timer.run(lambda: (prover.prove(setup, vals), 0)[1])
        verifier = Groth16Verifier()
        ok = verifier.verify(setup, [3], proof)
        backend = jax.default_backend()
        # unit is proof/s (ops_per_iter=1) so speedup_vs_baseline compares
        # like-for-like against the reference's <100 ms/proof target —
        # the old constraints/s throughput overstated it m-fold (r4).
        self._record("zk", f"groth16_prove_2e{log_constraints}", backend,
                     m, samples, 1, bool(ok), batch=1, unit="proof/s")
        vsamples = self.timer.run(
            lambda: (verifier.verify(setup, [3], proof), 0)[1])
        self._record("zk", f"groth16_verify_2e{log_constraints}", backend,
                     m, vsamples, 1, bool(ok), batch=1, unit="verify/s")
        if not msm:
            return

        c = bn254_g1()
        rng = np.random.default_rng(7)
        svals = [int(s) for s in rng.integers(1, 1 << 62, msm_points)]
        pts = c.fixed_base_mul(list(range(1, msm_points + 1)))
        limbs = _scalars(svals)
        out = c.msm(limbs, pts)
        samples = self.timer.run(lambda: c.msm(limbs, pts))
        want = c.msm(limbs, pts, backend="host")
        ga, gb, gi = c.to_affine_ints(out)
        wa, wb, wi = c.to_affine_ints(want)
        ok = (np.array_equal(ga, wa) and np.array_equal(gb, wb)
              and np.array_equal(gi, wi))
        self._record("zk", f"msm_bn254_{msm_points}", backend, msm_points,
                     samples, msm_points, bool(ok), batch=msm_points)

        # G2 MSM (device Fq2 Pippenger, zk/curve_g2.py) — the reference has
        # no G2 acceleration at all (zk_hardware_accel.mm is G1-only).
        # Smaller batch: the host-oracle check is FQ2 big-int Pippenger.
        from ..zk.curve_g2 import bn254_g2
        from ..zk.pairing import g2_msm, g2_mul, G2_GENERATOR
        g2n = max(64, msm_points // 8)
        g2c = bn254_g2()
        ks = [int(k) for k in rng.integers(1, 1 << 16, g2n)]
        aff = [g2_mul(G2_GENERATOR, k) for k in ks]
        pts2 = g2c.from_affine_pairs(aff)
        svals2 = [int(s) for s in rng.integers(1, 1 << 62, g2n)]
        limbs2 = _scalars(svals2)
        out2 = g2c.msm(limbs2, pts2)
        samples = self.timer.run(lambda: g2c.msm(limbs2, pts2))
        got_aff = g2c.to_affine_pairs((out2[0][None], out2[1][None],
                                       out2[2][None]))[0]
        ok2 = got_aff == g2_msm(aff, svals2)
        self._record("zk", f"msm_bn254_g2_{g2n}", backend, g2n, samples,
                     g2n, bool(ok2), batch=g2n)

    def benchmark_memory(self):
        """Dispatch-floor + transfer-bandwidth rows — the TPU analog of the
        reference's memory suite (cpp/src/comprehensive_benchmark.cpp
        Memory_System benchmarks, BENCHMARK_REPORT.md:189-217).

        The dispatch_floor row measures the fixed cost of ONE jitted
        dispatch closed by a tiny d2h read (on the axon relay this floor
        is ~24-29 ms and dominates every small-shape row — VERDICT r3
        weak #4); it is stored on the runner and subtracted into every
        later row's mean_minus_floor_us column.  Distinct inputs per
        iteration defeat relay-side dispatch dedup, as everywhere."""
        import jax.numpy as jnp

        tiny = [jnp.full((8, 128), np.uint32(i + 1)) for i in
                range(self.timer.iters)]
        f = jax.jit(lambda x: x + jnp.uint32(1))
        samples = self.timer.run(lambda i: f(tiny[i]))
        ok = bool(np.asarray(f(tiny[0]))[0, 0] == 2)
        self.dispatch_floor_s = min(samples)
        self._record("memory", "dispatch_floor", jax.default_backend(),
                     8 * 128 * 4, samples, 1, ok, batch=1,
                     unit="dispatch/s")

        # Host->device and device->host bandwidth at 16 MB (the
        # reference's largest memcpy row is 16384 KB).
        nbytes = 16 * 1024 * 1024
        arrs = [np.random.default_rng(i).integers(
            0, 2 ** 32, nbytes // 4, dtype=np.uint32) for i in
            range(self.timer.iters)]
        dev_arrs = None

        def h2d(i):
            out = jax.device_put(arrs[i])
            return out

        samples = self.timer.run(h2d)
        self._record("memory", "h2d_16mb", jax.default_backend(), nbytes,
                     samples, nbytes, True, batch=1, unit="bytes/s")
        dev_arrs = [jax.device_put(a) + jnp.uint32(i)
                    for i, a in enumerate(arrs)]   # distinct device data
        for d in dev_arrs:
            force_execution(d)
        samples = self.timer.run(lambda i: np.asarray(dev_arrs[i]))
        self._record("memory", "d2h_16mb", jax.default_backend(), nbytes,
                     samples, nbytes, True, batch=1, unit="bytes/s")

    def benchmark_zk_proof_systems(self):
        """Bulletproofs + PLONK prove/verify rows with proof sizes, against
        the reference's README targets (README.md:82-84; BASELINE.md) —
        VERDICT r3 next-round #4: no artifact measured these at all.

        Shapes match the reference's claims: a 64-bit range proof and a
        small-circuit PLONK proof.  prove()/verify() end in host fetches,
        so the timed thunks are synchronous by construction."""
        from ..zk.bulletproofs import (
            BulletproofsGens, BulletproofsProver, BulletproofsVerifier)
        from ..zk.plonk import PlonkCircuit, PlonkProver, PlonkVerifier
        from ..zk.curve import bn254_g1

        backend = jax.default_backend()
        curve = bn254_g1()
        n_bits = 64
        gens = BulletproofsGens.generate(curve, n_bits)
        prover = BulletproofsProver(curve)
        verifier = BulletproofsVerifier(curve)
        rng = np.random.default_rng(9)
        vals = [int.from_bytes(rng.bytes(8), "little")
                for _ in range(self.timer.iters)]
        blinds = [prover.random_scalar() for _ in vals]
        coms = [prover.commit(v, b, gens) for v, b in zip(vals, blinds)]
        samples = self.timer.run(
            lambda i: prover.prove_range(vals[i], blinds[i], n_bits, gens))
        proofs = [prover.prove_range(v, b, n_bits, gens)
                  for v, b in zip(vals, blinds)]
        # uncompressed size: 4 points + 3 scalars + IPA(2 log2 n points +
        # 2 scalars); the reference's ~700 B claim is compressed points.
        import math as _m
        bp_bytes = 4 * 64 + 3 * 32 + 2 * int(_m.log2(n_bits)) * 64 + 2 * 32
        oks = []
        samples_v = self.timer.run(
            lambda i: oks.append(verifier.verify_range(
                coms[i], proofs[i], n_bits, gens)))
        ok_all = all(verifier.verify_range(c, p, n_bits, gens)
                     for c, p in zip(coms, proofs))
        self._record("zk", f"bp_range_prove_{n_bits}", backend, n_bits,
                     samples, 1, bool(ok_all), batch=1, unit="proof/s",
                     proof_bytes=bp_bytes)
        self._record("zk", f"bp_range_verify_{n_bits}", backend, n_bits,
                     samples_v, 1, bool(all(oks)), batch=1, unit="verify/s",
                     proof_bytes=bp_bytes)

        # PLONK: x*y = z circuit (the shape the round-3 size/pairing tests
        # pin); prove includes ZK blinding + batched openings.
        c = PlonkCircuit()
        z = c.public_input()
        x = c.new_var()
        y = c.new_var()
        xy = c.mul(x, y)
        c.assert_equal(xy, z)
        pprover = PlonkProver()
        psetup = pprover.setup(c, kzg_seed=1)
        asg = [{z: 42, x: 6, y: 7, xy: 42} for _ in range(self.timer.iters)]
        samples = self.timer.run(lambda i: pprover.prove(psetup, asg[i],
                                                         [42]))
        pproofs = [pprover.prove(psetup, a, [42]) for a in asg]
        pverifier = PlonkVerifier()
        plonk_bytes = 64 * len(pproofs[0].commits) + \
            32 * len(pproofs[0].evals)
        oks2 = []
        samples_v = self.timer.run(
            lambda i: oks2.append(pverifier.verify(psetup, [42],
                                                   pproofs[i])))
        ok_all2 = all(pverifier.verify(psetup, [42], p) for p in pproofs)
        self._record("zk", "plonk_prove", backend, len(c.gates), samples,
                     1, bool(ok_all2), batch=1, unit="proof/s",
                     proof_bytes=plonk_bytes)
        self._record("zk", "plonk_verify", backend, len(c.gates),
                     samples_v, 1, bool(all(oks2)), batch=1,
                     unit="verify/s", proof_bytes=plonk_bytes)

    def benchmark_ckks(self, batch_slots: int | None = None):
        """CKKS leveled multiply-relin-rescale at the CKKS_128_ML chain
        (N=16384, 5 moduli — parameter_set.cpp:226-259).  The reference
        ships this preset but computes BFV semantics on one modulus; this
        row times the real thing (per-prime NTT tensor + RNS keyswitch +
        exact rescale) and checks elementwise precision."""
        from ..core.params import CKKS_128_ML
        from ..core.ckks import CkksEngine

        params = CKKS_128_ML()
        eng = CkksEngine(params)
        key = jax.random.PRNGKey(0)
        sk = eng.generate_secret_key(jax.random.fold_in(key, 0))
        pk = eng.generate_public_key(jax.random.fold_in(key, 1), sk)
        rlk = eng.generate_relin_keys(jax.random.fold_in(key, 2), sk)
        n_slots = params.poly_degree // 2
        rng = np.random.default_rng(5)
        va = rng.uniform(-1, 1, n_slots)
        vb = rng.uniform(-1, 1, n_slots)
        ca = eng.encrypt(jax.random.fold_in(key, 3), va, pk)
        cb = eng.encrypt(jax.random.fold_in(key, 4), vb, pk)
        # Distinct second operand per timed iteration (relay dedup defense)
        cbs = [eng.encrypt(jax.random.fold_in(key, 100 + i), vb, pk)
               for i in range(max(self.timer.iters, 8))]
        # VERDICT r3 weak #6: the old row had undefined units (8192
        # "ops"/iter) and 35% relative stddev from 2-sample noise.  Unit
        # is now ONE leveled multiply-relin-rescale per op ("mul/s"), with
        # 8 timed iterations.
        saved = self.timer.iters
        self.timer.iters = max(saved, 8)
        try:
            samples = self.timer.run(
                lambda i: eng.multiply_relin_rescale(ca, cbs[i], rlk).c0)
        finally:
            self.timer.iters = saved
        out = eng.multiply_relin_rescale(ca, cb, rlk)
        got = eng.decrypt(out, sk)
        correct = bool(np.max(np.abs(np.real(got) - va * vb)) < 1e-3)
        self._record("ckks", "ckks_mul_relin_rescale_N16384",
                     jax.default_backend(), params.poly_degree, samples,
                     1, correct, batch=1, unit="mul/s (8192 slots/mul)")

    def benchmark_ballot(self, depth: int = 20):
        """End-to-end per-ballot submission latency at a realistic voter
        scale — a depth-`depth` eligibility tree (2^20 ~= 1M registered
        voters): one-hot encrypt + 8-bit Bulletproofs validity range proof
        + Groth16 Poseidon-Merkle eligibility proof, the exact primitive
        chain of VotingSystem.submit_ballot (api/voting.py:197-258;
        VERDICT r4 next-round #8; reference anchor README.md:756).

        The Merkle path is synthesized (root = fold of random siblings) —
        identical per-ballot work to a real 2^depth-leaf tree; only the
        untimed registration-time tree build is skipped."""
        from ..core.params import ParameterSet, FHEScheme
        from ..core.keys import KeyManager
        from ..core.encrypt import EncryptionEngine
        from ..zk.bulletproofs import (
            BulletproofsGens, BulletproofsProver, BulletproofsVerifier)
        from ..zk.circuits import EligibilityCircuit
        from ..zk.groth16 import Groth16Prover, Groth16Verifier

        backend = jax.default_backend()
        # ballot encryption: the voting preset's RLWE shape
        params = ParameterSet(
            scheme=FHEScheme.TFHE, poly_degree=1024,
            moduli=[1095216660481], lwe_dimension=630,
            lwe_noise_std=3.2e-11, glwe_dimension=1,
            decomp_base_log=23, decomp_level=1, plaintext_modulus=64)
        eng = EncryptionEngine(params)
        km = KeyManager(params, eng.ring)
        sk = km.generate_secret_key(jax.random.PRNGKey(0))
        pk = km.generate_public_key(jax.random.PRNGKey(1), sk)

        from ..zk.curve import bn254_g1
        curve = bn254_g1()
        n_bits = 8
        gens = BulletproofsGens.generate(curve, n_bits)
        bp_prover = BulletproofsProver(curve)
        bp_verifier = BulletproofsVerifier(curve)

        circ = EligibilityCircuit(depth)
        g16_prover = Groth16Prover(rng_seed=7)
        g16_setup = g16_prover.setup(circ.r1cs)
        g16_verifier = Groth16Verifier()

        rng = np.random.default_rng(11)
        iters = max(self.timer.iters, 3)
        wits = []
        for i in range(iters):
            vid = int(rng.integers(1, 1 << 62)) | (i << 62)
            secret = int(rng.integers(1, 1 << 62))
            path = [int(x) for x in rng.integers(1, 1 << 62, depth)]
            bits = [int(b) for b in rng.integers(0, 2, depth)]
            node = circ.leaf(vid)
            for sib, bit in zip(path, bits):
                node = (circ.hash2_int(sib, node) if bit
                        else circ.hash2_int(node, sib))
            wits.append((vid, secret, path, bits, node))
        blinds = [bp_prover.random_scalar() for _ in range(iters)]
        choices = [int(rng.integers(0, 4)) for _ in range(iters)]
        results = {}

        def submit(i):
            vid, secret, path, bits, root = wits[i]
            onehot = np.zeros(4, dtype=np.uint64)
            onehot[choices[i]] = 1
            ct = eng.encrypt(jax.random.fold_in(jax.random.PRNGKey(5), i),
                             onehot, pk)
            com = bp_prover.commit(choices[i], blinds[i], gens)
            bp = bp_prover.prove_range(choices[i], blinds[i], n_bits, gens)
            wit = circ.generate_witness(vid, secret, path, bits, root)
            g16 = g16_prover.prove(g16_setup, wit.assignment)
            results[i] = (ct, com, bp, g16, wit.public_inputs)
            return ct.c0

        saved_w, saved_i = self.timer.warmup, self.timer.iters
        self.timer.warmup, self.timer.iters = 1, iters
        try:
            samples = self.timer.run(submit)
        finally:
            self.timer.warmup, self.timer.iters = saved_w, saved_i

        # verify every timed ballot end-to-end
        ok = True
        for i, (ct, com, bp, g16, pubs) in results.items():
            ok = ok and bp_verifier.verify_range(com, bp, n_bits, gens)
            ok = ok and g16_verifier.verify(g16_setup, pubs, g16)
            dec = eng.decode(eng.phase(ct, sk), 4)
            want = np.zeros(4, dtype=np.uint64)
            want[choices[i]] = 1
            ok = ok and bool(np.array_equal(dec, want))
        self._record("pipeline", f"ballot_submit_depth{depth}", backend,
                     depth, samples, 1, bool(ok), batch=1, unit="ballot/s",
                     proof_bytes=0)

    def benchmark_pipeline(self, ballots: int = 64):
        """Encrypted-ballot tally pipeline throughput."""
        from ..core.params import ParameterSet, FHEScheme
        from ..core.keys import KeyManager
        from ..core.encrypt import EncryptionEngine

        params = ParameterSet(
            scheme=FHEScheme.TFHE, poly_degree=1024,
            moduli=[1095216660481], lwe_dimension=630,
            lwe_noise_std=3.2e-11, glwe_dimension=1,
            decomp_base_log=23, decomp_level=1, plaintext_modulus=64)
        eng = EncryptionEngine(params)
        km = KeyManager(params, eng.ring)
        sk = km.generate_secret_key(jax.random.PRNGKey(0))
        pk = km.generate_public_key(jax.random.PRNGKey(1), sk)
        cts = [eng.encrypt(jax.random.PRNGKey(10 + i), 1, pk)
               for i in range(ballots)]
        samples = self.timer.run(lambda: eng.batch_add(cts).c0)
        total = eng.batch_add(cts)
        dec = eng.decode(eng.phase(total, sk))
        self._record("pipeline", f"tally_{ballots}", "tpu", ballots,
                     samples, ballots,
                     bool(int(dec[0]) == ballots % eng.t), batch=ballots)

    def export_all(self, outdir: str):
        """Write CSVs + JSON + HTML for the CURRENT results — called after
        every stage (crash/timeout keeps the completed stages' rows)."""
        os.makedirs(outdir, exist_ok=True)
        for suite_name, text in self.export_csv().items():
            with open(os.path.join(outdir, f"{suite_name}.csv"), "w") as f:
                f.write(text)
        with open(os.path.join(outdir, "benchmark_results.json"), "w") as f:
            f.write(self.export_json())
        with open(os.path.join(outdir, "benchmark_report.html"), "w") as f:
            f.write(self.export_html())

    def run_full_suite(self, production: bool = True,
                       autodump_dir: str | None = None):
        import sys

        def stage(name):
            if autodump_dir and self.results:
                self.export_all(autodump_dir)
            print(f"[bench_suite] {name}...", file=sys.stderr, flush=True)

        stage("memory")
        self.benchmark_memory()      # first: later rows use the floor
        stage("modmul")
        self.benchmark_modmul()
        stage("ntt")
        self.benchmark_ntt()
        stage("poly_mul")
        self.benchmark_poly_mul()
        stage("bootstrap")
        self.benchmark_bootstrap(production=production)
        if production and os.environ.get("NFA_BENCH_TFHE256"):
            stage("bootstrap_tfhe256")
            self.benchmark_bootstrap_tfhe256()
        stage("zk")
        self.benchmark_zk(log_constraints=12 if production else 6,
                          msm_points=4096 if production else 64)
        if production:
            stage("zk proof systems (BP + PLONK)")
            self.benchmark_zk_proof_systems()
        if production:
            stage("ckks")
            self.benchmark_ckks()
        stage("pipeline")
        self.benchmark_pipeline()
        if production and os.environ.get("NFA_BENCH_ZK_BIG"):
            # Groth16 proving at scale on device (VERDICT r2 item 5):
            # 2^14 and 2^16 constraint chains, device QAP + chunked device
            # MSMs (incl. the G2 B-element), verified under the real
            # pairing.  Runs LAST (proves are minutes-scale) with fewer
            # timed iterations.
            warm, iters = self.timer.warmup, self.timer.iters
            self.timer.warmup, self.timer.iters = 1, 2
            try:
                stage("zk groth16 2^14")
                self.benchmark_zk(log_constraints=14, msm=False)
                if os.environ.get("NFA_BENCH_ZK_2E16"):
                    # 2^16 CRASHES the v5e TPU worker (kernel fault, even
                    # with 8K-point MSM chunks — observed 2026-08-19
                    # twice); keep it opt-in until the QAP/Fr-NTT memory
                    # at 2m=131072 is chunked too
                    stage("zk groth16 2^16")
                    self.benchmark_zk(log_constraints=16, msm=False)
            finally:
                self.timer.warmup, self.timer.iters = warm, iters
        if autodump_dir:
            self.export_all(autodump_dir)
        return self.results

    # -- recording / export --------------------------------------------------
    def _record(self, suite, name, backend, size, samples, ops_per_iter,
                correct, batch=1, unit="op/s", proof_bytes=0):
        mean, std = StatisticalAnalyzer.analyze(samples)
        tput = ops_per_iter / mean if mean else 0.0
        base = _BASELINES.get(name, 0.0)
        # Floor-adjusted column: subtract the measured per-dispatch floor
        # (benchmark_memory's dispatch_floor row) so small-shape rows
        # separate device time from relay latency.  Only meaningful for
        # single-dispatch timed thunks; proof rows (many dispatches) keep
        # the raw mean only.
        floor = getattr(self, "dispatch_floor_s", None)
        adj = -1.0
        if floor is not None and suite in ("modmul", "ntt", "poly_mul",
                                           "bootstrap", "ckks", "pipeline"):
            adj = max(mean - floor, 0.0) * 1e6
        self.results.append(BenchmarkResult(
            suite=suite, name=name, backend=backend, size=size, batch=batch,
            mean_us=mean * 1e6, stddev_us=std * 1e6,
            throughput_ops_s=tput,
            speedup_vs_baseline=(tput / base if base else 0.0),
            correct=correct, unit=unit, mean_minus_floor_us=adj,
            proof_bytes=proof_bytes))

    def export_csv(self) -> dict:
        """Per-suite CSVs, same column layout as the reference's
        NTT_(degree=1024).csv etc. plus batch + speedup columns."""
        out = {}
        suites = {r.suite for r in self.results}
        for s in suites:
            buf = io.StringIO()
            w = csv.writer(buf)
            w.writerow(["name", "backend", "size", "batch", "mean_us",
                        "stddev_us", "throughput_ops_s",
                        "speedup_vs_baseline", "correct", "unit",
                        "mean_minus_floor_us", "proof_bytes"])
            for r in self.results:
                if r.suite == s:
                    w.writerow([r.name, r.backend, r.size, r.batch,
                                f"{r.mean_us:.2f}", f"{r.stddev_us:.2f}",
                                f"{r.throughput_ops_s:.1f}",
                                f"{r.speedup_vs_baseline:.2f}", r.correct,
                                r.unit,
                                f"{r.mean_minus_floor_us:.2f}",
                                r.proof_bytes])
            out[s] = buf.getvalue()
        return out

    def export_json(self) -> str:
        return json.dumps([asdict(r) for r in self.results], indent=2)

    def export_html(self) -> str:
        """Self-contained HTML report (the reference exports CSV/JSON/HTML,
        comprehensive_benchmark.h:237-247; this is the HTML leg)."""
        rows = []
        for r in self.results:
            cls = "ok" if r.correct else "bad"
            rows.append(
                f"<tr class='{cls}'><td>{r.suite}</td><td>{r.name}</td>"
                f"<td>{r.backend}</td><td>{r.size}</td><td>{r.batch}</td>"
                f"<td>{r.mean_us:.2f}</td><td>{r.stddev_us:.2f}</td>"
                f"<td>{r.throughput_ops_s:,.1f}</td>"
                f"<td>{r.speedup_vs_baseline:.2f}</td>"
                f"<td>{r.correct}</td></tr>")
        dev = jax.devices()[0]
        return (
            "<!doctype html><html><head><meta charset='utf-8'>"
            "<title>node-fhe-accelerate-tpu benchmarks</title><style>"
            "body{font-family:system-ui;margin:2rem}"
            "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
            "padding:4px 8px;text-align:right}th{background:#eee}"
            "td:nth-child(-n+3){text-align:left}"
            "tr.bad{background:#fdd}</style></head><body>"
            f"<h1>Benchmark report</h1><p>device: {dev.device_kind} "
            f"({dev.platform})</p><table><tr><th>suite</th><th>name</th>"
            "<th>backend</th><th>size</th><th>batch</th><th>mean µs</th>"
            "<th>stddev µs</th><th>ops/s</th><th>vs baseline</th>"
            "<th>correct</th></tr>" + "".join(rows) +
            "</table></body></html>")


def main():
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "benchmark_results")
    runner = ComprehensiveBenchmarkRunner()
    runner.run_full_suite(autodump_dir=outdir)
    runner.export_all(outdir)
    for r in runner.results:
        print(f"{r.suite:10s} {r.name:28s} {r.throughput_ops_s:14,.1f} ops/s"
              f"  x{r.speedup_vs_baseline:8.2f}  correct={r.correct}")


if __name__ == "__main__":
    main()
