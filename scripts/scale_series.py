"""Extend the corpus-size (weak-scaling) series with one more corpus
size — e.g. the 800k -> 1.6M -> 3.2M trend behind BENCH/BASELINE.md's
"per-core throughput rises with data" table.

Usage:  python scripts/scale_series.py [n_docs] [reps]

Runs each level `reps` times interleaved (lo, hi, lo, hi) through
bench.run_parallelism_level — CPU-pinned isolated JVMs with per-run
hypervisor-steal accounting, heap scaled to the corpus — and APPENDS
every run to BENCH/scaling_runs.jsonl. The report generator
(scripts/collect_scaling.py --report) derives the data-size table from
the ledger, so regenerating the report never drops these points (the
old design merged a `scale_series` key into scaling.json, which the
next report overwrite silently discarded).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LEDGER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH", "scaling_runs.jsonl")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_cpus, hi_cpus = bench._scaling_levels()
    runs: list[dict] = []
    for r in range(reps):
        for cpus in (lo_cpus, hi_cpus):
            res = bench.run_parallelism_level(cpus, n_docs)
            runs.append(res)
            with open(LEDGER, "a") as f:
                f.write(json.dumps(res) + "\n")
            print(f"rep {r} local[{cpus}]: {res['wall_sec']} s, "
                  f"{res['docs_per_sec']} docs/s, steal {res['steal_sec']} s",
                  flush=True)
    lo = max((r for r in runs if r["cpus"] == lo_cpus),
             key=lambda r: r["docs_per_sec"])
    hi = max((r for r in runs if r["cpus"] == hi_cpus),
             key=lambda r: r["docs_per_sec"])
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi_cpus / lo_cpus)
    print(f"strong-scaling efficiency @ {n_docs}: {eff:.3f}")
    print("ledgered; regenerate the report with "
          "`python scripts/collect_scaling.py --report`")


if __name__ == "__main__":
    main()
