"""Selective hardware refresh of benchmark_results/ artifacts.

Runs only the suites named on the command line (default: the rows added
or redefined in round 4 — memory, zk proof systems, ckks) and MERGES the
new rows into the committed benchmark_results/ artifacts: a re-run row
replaces the old row with the same (suite, name, backend); everything
else is preserved.  Full regeneration stays
`python -m node_fhe_accelerate_tpu.utils.bench_suite` — this script
exists so a 2-minute refresh doesn't pay the bootstrap suite's
minutes-scale keygen compiles for rows that didn't change.

Usage: python scripts/update_bench_artifacts.py [memory zk_ps ckks zk pipeline ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "benchmark_results")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from node_fhe_accelerate_tpu.utils.bench_suite import (   # noqa: E402
    ComprehensiveBenchmarkRunner, BenchmarkResult)

STAGES = {
    "memory": lambda r: r.benchmark_memory(),
    "zk_ps": lambda r: r.benchmark_zk_proof_systems(),
    "ckks": lambda r: r.benchmark_ckks(),
    "zk": lambda r: r.benchmark_zk(log_constraints=12, msm_points=4096),
    "pipeline": lambda r: r.benchmark_pipeline(),
    "ballot": lambda r: r.benchmark_ballot(),
    "modmul": lambda r: r.benchmark_modmul(),
    "ntt": lambda r: r.benchmark_ntt(),
    "poly_mul": lambda r: r.benchmark_poly_mul(),
    "bootstrap": lambda r: r.benchmark_bootstrap(),
}


def main():
    names = sys.argv[1:] or ["memory", "zk_ps", "ckks"]
    runner = ComprehensiveBenchmarkRunner()
    for name in names:
        print(f"[update_bench] {name}...", file=sys.stderr, flush=True)
        STAGES[name](runner)
        _merge_and_write(runner)   # autodump after every stage
    for r in runner.results:
        print(f"{r.suite:10s} {r.name:28s} {r.throughput_ops_s:14,.1f} "
              f"{r.unit}  correct={r.correct}")


def _merge_and_write(runner):
    path = os.path.join(OUTDIR, "benchmark_results.json")
    old = []
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    fields = set(BenchmarkResult.__dataclass_fields__)
    merged = {}
    for row in old:
        # tolerate rows from before the round-4 schema (unit/floor/proof
        # columns absent) — defaults fill in
        row = {k: v for k, v in row.items() if k in fields}
        merged[(row["suite"], row["name"], row["backend"])] = \
            BenchmarkResult(**row)
    for r in runner.results:
        merged[(r.suite, r.name, r.backend)] = r

    # Backfill mean_minus_floor_us (-1 = unset) from the measured
    # dispatch_floor row — but only onto rows measured in THIS run
    # (runner.results), with exact backend-prefix semantics ("tpu-"
    # family): applying the current run's floor to historical merged
    # rows from other machines/runs would persist derived values as if
    # measured (ADVICE r4).
    floor_row = next((r for r in runner.results
                      if r.name == "dispatch_floor"), None)
    if floor_row is not None:  # floor not re-measured: leave -1 as unset
        fresh = {(r.suite, r.name, r.backend) for r in runner.results}
        for key, r in merged.items():
            if key in fresh and r.mean_minus_floor_us < 0 \
                    and r.name != "dispatch_floor" \
                    and r.backend.startswith("tpu-") \
                    and floor_row.backend.startswith("tpu-"):
                r.mean_minus_floor_us = max(
                    0.0, r.mean_us - floor_row.mean_us)

    out = ComprehensiveBenchmarkRunner()
    out.results = list(merged.values())
    out.export_all(OUTDIR)


if __name__ == "__main__":
    main()
