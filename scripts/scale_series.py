"""Extend the corpus-size strong-scaling series (BENCH/scaling.json
`scale_series`) with one more corpus size — round-3 item: measure the
4->16 series at 1.6M docs in a steal-clean window (the 0.497 @ 200k ->
0.785 @ 800k trend predicts >= 0.8).

Usage:  python scripts/scale_series.py [n_docs] [reps]

Runs each level `reps` times interleaved (lo, hi, lo, hi) through
bench.run_parallelism_level — CPU-pinned isolated JVMs with per-run
hypervisor-steal accounting, heap scaled to the corpus — takes the
fastest run per level (min = noise-robust under additive noise), and
merges the result into BENCH/scaling.json without touching the
headline lo/hi (which stay at the committed 800k protocol).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_cpus, hi_cpus = bench._scaling_levels()
    runs: list[dict] = []
    for r in range(reps):
        for cpus in (lo_cpus, hi_cpus):
            res = bench.run_parallelism_level(cpus, n_docs)
            runs.append(res)
            print(f"rep {r} local[{cpus}]: {res['wall_sec']} s, "
                  f"{res['docs_per_sec']} docs/s, steal {res['steal_sec']} s",
                  flush=True)
    lo = max((r for r in runs if r["cpus"] == lo_cpus),
             key=lambda r: r["docs_per_sec"])
    hi = max((r for r in runs if r["cpus"] == hi_cpus),
             key=lambda r: r["docs_per_sec"])
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi_cpus / lo_cpus)
    print(f"efficiency @ {n_docs}: {eff:.3f}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "scaling.json")
    with open(path) as f:
        s = json.load(f)
    series = s.setdefault("scale_series", {})
    series[str(n_docs)] = {"efficiency": round(eff, 3), "lo": lo, "hi": hi,
                           "all_runs": runs}
    with open(path, "w") as f:
        json.dump(s, f)
    print(f"merged into {path}")


if __name__ == "__main__":
    main()
