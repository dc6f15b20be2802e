"""One-off: fill the (16-core, 6.4M) weak-scaling cell (VERDICT r4
item 5) with a same-window 4-core companion rep, appending every run
to the ledger. Corpus is the chunked-parquet fixture, generated once
and reused (bench.run_level_inprocess reads the _DONE-marked dir).

The __main__ guard is load-bearing: write_pages_parquet uses a
spawn-context Pool, which re-imports this module in every worker.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEDGER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH", "scaling_runs.jsonl")


def main() -> None:
    import bench
    from lsh_apg_spark.fixtures import write_pages_parquet

    t0 = time.time()
    corpus = write_pages_parquet(
        6_400_000, seed=42,
        out_dir="/tmp/spark_graft_scaling_6400000_s42", n_jobs=16)
    print(f"corpus ready in {time.time()-t0:.1f}s: {corpus}", flush=True)

    for cpus in (16, 4, 16):
        res = bench.run_parallelism_level(cpus, 6_400_000)
        with open(LEDGER, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(f"local[{cpus}] 6.4M: {res['wall_sec']} s, "
              f"{res['docs_per_sec']} docs/s, steal {res['steal_sec']} s",
              flush=True)
    print("done")


if __name__ == "__main__":
    main()
