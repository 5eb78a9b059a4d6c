"""Comprehensive benchmark suite: timings, statistics, CSV/JSON export.

Twin of the reference's `ComprehensiveBenchmarkRunner`
(cpp/include/comprehensive_benchmark.h:313-429, with the same CSV column
schema its reports use: name, backend, mean_us, stddev_us, throughput,
speedup, correct) and its `StatisticalAnalyzer` (:141-186) /
`BenchmarkTimer` (:271-300).

Suites: modmul, ntt, poly_mul, bootstrap, tally pipeline.  Every result
carries a `correct` flag verified against the big-int oracle (Property 14:
backend equivalence — the accelerated path must match the scalar truth).
"""
from __future__ import annotations

import csv
import io
import json
import math
import time
from dataclasses import dataclass, field, asdict

import numpy as np
import jax

__all__ = ["BenchmarkResult", "StatisticalAnalyzer", "BenchmarkTimer",
           "ComprehensiveBenchmarkRunner"]


@dataclass
class BenchmarkResult:
    suite: str
    name: str
    backend: str
    size: int
    mean_us: float
    stddev_us: float
    throughput_ops_s: float
    speedup_vs_baseline: float
    correct: bool


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


class BenchmarkTimer:
    """Warmup + timed iterations over a jitted thunk."""

    def __init__(self, warmup: int = 2, iters: int = 5):
        self.warmup = warmup
        self.iters = iters

    def run(self, thunk) -> list:
        for _ in range(self.warmup):
            out = thunk()
        jax.block_until_ready(out)
        samples = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            out = thunk()
            jax.block_until_ready(out)
            samples.append(time.perf_counter() - t0)
        return samples


class ComprehensiveBenchmarkRunner:
    """(comprehensive_benchmark.h:400 run_full_suite)"""

    def __init__(self, warmup: int = 2, iters: int = 5):
        self.timer = BenchmarkTimer(warmup, iters)
        self.results: list[BenchmarkResult] = []

    # -- suites --------------------------------------------------------------
    def benchmark_modmul(self, sizes=(1024, 16384)):
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
                         samples, n, correct)

    def benchmark_ntt(self, degrees=(1024, 4096), batch: int = 2048):
        from ..ops.ntt import NTTContext
        from ..ops.u64 import u64_from_np
        from ..core.params import Primes

        for n in degrees:
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
                         batch, bool(np.array_equal(rt, a[0])))

    def benchmark_poly_mul(self, degrees=(1024,), batch: int = 512):
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
                         batch, ok)

    def benchmark_bootstrap(self, batch: int = 8, tiny: bool = True):
        from ..core.bootstrap import TfheParams, TfheEngine

        p = TfheParams(n_lwe=16, poly_degree=256, pbs_base_log=7,
                       pbs_level=3, ks_base_log=4, ks_level=8,
                       lwe_noise_std=0.0, glwe_noise_std=0.0) if tiny \
            else TfheParams()
        eng = TfheEngine(p)
        key = jax.random.PRNGKey(0)
        lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
        glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
        bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                        lwe_sk, glwe_sk)
        import jax.numpy as jnp
        msgs = jnp.arange(batch, dtype=jnp.uint32) % p.plaintext_modulus
        msgs = jnp.where(msgs >= p.plaintext_modulus // 2, 0, msgs)
        ct = eng.lwe_encrypt(jax.random.PRNGKey(3), msgs, lwe_sk)
        tp = eng.default_test_poly()
        samples = self.timer.run(lambda: eng.bootstrap_jit(ct, bsk, tp))
        out = eng.bootstrap_jit(ct, bsk, tp)
        dec = np.asarray(eng.lwe_decrypt(out, lwe_sk))
        correct = bool(np.array_equal(dec, np.asarray(msgs)))
        self._record("bootstrap",
                     f"pbs_n{p.n_lwe}_N{p.poly_degree}", "tpu", batch,
                     samples, batch, correct)

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
                     bool(int(dec[0]) == ballots % eng.t))

    def run_full_suite(self):
        self.benchmark_modmul()
        self.benchmark_ntt()
        self.benchmark_poly_mul()
        self.benchmark_bootstrap()
        self.benchmark_pipeline()
        return self.results

    # -- recording / export --------------------------------------------------
    def _record(self, suite, name, backend, size, samples, ops_per_iter,
                correct):
        mean, std = StatisticalAnalyzer.analyze(samples)
        self.results.append(BenchmarkResult(
            suite=suite, name=name, backend=backend, size=size,
            mean_us=mean * 1e6, stddev_us=std * 1e6,
            throughput_ops_s=ops_per_iter / mean if mean else 0.0,
            speedup_vs_baseline=0.0, correct=correct))

    def export_csv(self) -> dict:
        """Per-suite CSVs, same column layout as the reference's
        NTT_(degree=1024).csv etc."""
        out = {}
        suites = {r.suite for r in self.results}
        for s in suites:
            buf = io.StringIO()
            w = csv.writer(buf)
            w.writerow(["name", "backend", "size", "mean_us", "stddev_us",
                        "throughput_ops_s", "correct"])
            for r in self.results:
                if r.suite == s:
                    w.writerow([r.name, r.backend, r.size,
                                f"{r.mean_us:.2f}", f"{r.stddev_us:.2f}",
                                f"{r.throughput_ops_s:.1f}", r.correct])
            out[s] = buf.getvalue()
        return out

    def export_json(self) -> str:
        return json.dumps([asdict(r) for r in self.results], indent=2)
