"""Graph-wall amortization measurement (VERDICT r3 item 4): does the
proximity-graph path's fixed per-round driver latency amortize at
production query-batch sizes?

The r3 picture at toy Q=20: graph ~7-9 s vs lsh ~2-4 s wall — the graph
pays ~10-15 driver-scheduled rounds of sub-second jobs, while winning
the COST metric (exact verifications) 2-11x. BENCH/ANN.md argued the
round cost is fixed per ROUND, not per row, so large Q amortizes it.
This script measures that claim: graph_topk vs lsh_topk on the same
prebuilt index / same clustered 20k corpus (bench.make_clustered_corpus)
at Q=20 and Q=2000, interleaved min-of-N, steal recorded per run.

Both paths run production-mode: the graph index is prebuilt outside
timing (the reference amortizes its build identically,
src/main.cpp:79-90) and the LSH knobs are calibrated ONCE outside
timing (calibrate_lsh_knobs) and passed explicitly.

Usage: python scripts/bench_graph_amortization.py [reps] [Q1,Q2,...]
(default batches 20,2000; at Q > 2000 recall/ratio/cost evaluate on
the first 500 queries — the exact golden at Q=20000 is a 20k x 20k
brute force that would dwarf the walls being measured — while the
WALLS always cover the full batch).
Emits one JSON line; paste-ready markdown table on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _git_head, _steal_jiffies, make_clustered_corpus  # noqa: E402
from lsh_apg_spark.operators import ann  # noqa: E402
from lsh_apg_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batches = ([int(x) for x in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [20, 2000])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("amortization", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    n_vecs = 20_000
    e = make_clustered_corpus(spark, n_vecs)

    t0 = time.monotonic()
    edges = ann.build_knn_graph(e, T=16, dim=64, seed=42) \
        .localCheckpoint(eager=True)
    build_sec = round(time.monotonic() - t0, 3)

    kn = ann.calibrate_lsh_knobs(e, dim=64, k=10)
    out: dict = {"metric": "graph_amortization", "n_vecs": n_vecs,
                 "graph_build_sec": build_sec, "lsh_knobs": kn,
                 "cpus": cpus, "commit": _git_head(), "batches": {}}

    md = [f"| Q | variant | wall best (s) | runs (wall/steal) | recall "
          f"| cost | n_rounds | avg_hop |",
          "|---|---|---|---|---|---|---|---|"]
    for q_n in batches:
        q = e.filter(F.col("vec_id") < q_n).localCheckpoint(eager=True)
        # quality metrics on a 500-query prefix at large Q: the golden
        # is quadratic in Q and would dominate the measurement session;
        # the WALLS below always run the full batch
        eval_n = min(q_n, 500) if q_n > 2000 else q_n
        q_eval = q.filter(F.col("vec_id") < eval_n)
        exact = ann.bruteforce_topk(q_eval, e, k=10) \
            .localCheckpoint(eager=True)

        def run_graph(st):
            return ann.graph_topk(q, e, k=10, dim=64, edges=edges,
                                  stats=st).localCheckpoint(eager=True)

        def run_lsh(st):
            return ann.lsh_topk(
                q, e, k=10, dim=64, bands=kn["bands"],
                rows_per_band=kn["rows_per_band"],
                num_probes=kn["num_probes"],
                stats=st).localCheckpoint(eager=True)

        variants = {"graph": run_graph, "lsh": run_lsh}
        runs: dict = {name: [] for name in variants}
        kept: dict = {}
        for _ in range(reps):
            for name, fn in variants.items():
                st: dict = {}
                s0 = _steal_jiffies()
                t0 = time.monotonic()
                res = fn(st)
                wall = round(time.monotonic() - t0, 3)
                runs[name].append(
                    {"wall_sec": wall,
                     "steal_sec": round((_steal_jiffies() - s0) / 100.0, 1)})
                if name not in kept or wall < kept[name][0]:
                    kept[name] = (wall, res, st)
        block: dict = {}
        for name in variants:
            wall, res, st = kept[name]
            ev = ann.ann_eval(res.filter(F.col("query_id") < eval_n),
                              exact)
            row = {"wall_best_sec": wall, "runs": runs[name], **ev}
            # cost over the FULL batch (ann_eval would divide the
            # full-batch candidate count by the sampled query count)
            if st.get("n_candidates") is not None:
                row["cost"] = round(
                    st["n_candidates"] / (q_n * n_vecs), 5)
                ev["cost"] = row["cost"]
            if eval_n < q_n:
                row["eval_sample_n"] = eval_n
            for extra in ("n_rounds", "avg_hop", "max_hop",
                          "n_pruned", "avg_admitted"):
                if extra in st:
                    row[extra] = st[extra]
            block[name] = row
            md.append(
                f"| {q_n} | {name} | {wall} | "
                + " / ".join(f"{r['wall_sec']}({r['steal_sec']})"
                             for r in runs[name])
                + f" | {ev['recall']} | {ev.get('cost')} "
                f"| {st.get('n_rounds', '-')} | {st.get('avg_hop', '-')} |")
        out["batches"][str(q_n)] = block

    print(json.dumps(out))
    print("\n".join(md), file=sys.stderr)


if __name__ == "__main__":
    main()
