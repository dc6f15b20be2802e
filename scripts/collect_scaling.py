"""Steal-aware scaling-run collector (VERDICT r3 items 1-3 context:
this host's hypervisor steal arrives in multi-minute storms, so
min-of-N WITHIN one window is not always enough — r4's first 800k
window measured 31-110 s of stolen CPU in every run).

Collects interleaved (lo, hi) dedup runs at the configured levels,
appending every run (with its stolen-CPU seconds) to a JSONL ledger,
and stops early once a CLEAN pair exists (both levels measured with
steal <= --clean-steal seconds). `--report` then writes
BENCH/BASELINE.md + scaling.json from the UNION of all ledger runs —
min-of-N across windows, every raw run and its steal published.

Usage:
  python scripts/collect_scaling.py --pairs 2          # measure
  python scripts/collect_scaling.py --report           # write report
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LEDGER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH", "scaling_runs.jsonl")


def load_ledger() -> list[dict]:
    if not os.path.exists(LEDGER):
        return []
    with open(LEDGER) as f:
        return [json.loads(line) for line in f if line.strip()]


def has_clean_pair(runs: list[dict], lo: int, hi: int, n_docs: int,
                   clean_steal: float) -> bool:
    # a clean pair must match the REQUESTED corpus size too — a ledger
    # already holding clean 800k runs must not satisfy a 6.4M request
    ok = {r["cpus"] for r in runs
          if r.get("steal_sec", 1e9) <= clean_steal
          and r.get("docs") == n_docs}
    return lo in ok and hi in ok


def main() -> None:
    lo, hi = bench._scaling_levels()
    n_docs = bench._scaling_docs()
    clean_steal = float(os.environ.get("SPARK_GRAFT_CLEAN_STEAL", "8"))

    if "--report" in sys.argv:
        runs = load_ledger()
        if not runs:
            raise SystemExit("no runs in ledger")
        out = bench.write_scaling_report(prior_runs=runs)
        print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
        return

    pairs = 2
    if "--pairs" in sys.argv:
        pairs = int(sys.argv[sys.argv.index("--pairs") + 1])
    # --force: measure fresh pairs even when the ledger already holds a
    # clean pair — used after a code change to re-evidence the criterion
    # on the NEW code (the early stop only makes sense within one round).
    force = "--force" in sys.argv
    runs = load_ledger()
    fresh: list[dict] = []
    for _ in range(pairs):
        if not force and has_clean_pair(runs, lo, hi, n_docs, clean_steal):
            print(f"clean pair present (steal <= {clean_steal}s) — stopping")
            break
        if force and has_clean_pair(fresh, lo, hi, n_docs, clean_steal):
            print(f"fresh clean pair measured (steal <= {clean_steal}s) — stopping")
            break
        for cpus in (lo, hi):
            r = bench.run_parallelism_level(cpus, n_docs)
            runs.append(r)
            fresh.append(r)
            with open(LEDGER, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(json.dumps(r))
    print(f"ledger: {len(runs)} runs; clean pair: "
          f"{has_clean_pair(runs, lo, hi, n_docs, clean_steal)}")


if __name__ == "__main__":
    main()
