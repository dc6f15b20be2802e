"""Benchmark harness (maps the reference's graphSearch/CSV bench loop,
src/alg.h:29-135): times the headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

  python bench.py             # driver mode: one JSON line to stdout
  python bench.py --scaling   # additionally run the dedup job at two
                              # parallelism levels (local[8] vs
                              # local[32]) and write BENCH/BASELINE.md
                              # with throughputs + scaling efficiency

The dedup corpus is synthesized deterministically at a size scaled to
the SF (input_hint shape; no external data): the same generator the
tests gate recall on, so the benched job is the recall-verified one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lsh_apg_spark.config import DedupConfig  # noqa: E402

CFG = DedupConfig()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _n_docs(sf: float) -> int:
    return max(400, int(200_000 * sf))


def _make_pages(spark, sf: float):
    from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
    fx = generate_pages(n_docs=_n_docs(sf), seed=42)
    df = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA)
    return df.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))) \
        .localCheckpoint(eager=True)


def _run_dedup(spark, pages, include_substring: bool = False) -> int:
    from lsh_apg_spark.pipeline import run_dedup
    res = run_dedup(spark, pages, CFG, include_substring=include_substring)
    return res.clusters.count()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline per-query timings (seconds)."""
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    names = [
        "bruteforce_jaccard_pairs", "exact_dedup", "minhash_lsh_pairs",
        "simhash_neardup", "ann_topk_bruteforce", "ann_topk_lsh",
        "token_stats", "lang_id", "pricing_summary", "revenue_by_nation",
    ]
    out = {}
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _scaling_docs() -> int:
    """Corpus size for the two-level scaling measurement. Larger than
    the headline-sf corpus on purpose: the scaling criterion is about
    how per-core WORK scales, so the job must be compute-dominated —
    at small n the fixed per-stage costs (job scheduling, stage
    barriers, the CC driver loop) swamp the signal, exactly as a
    1000-executor cluster would be swamped by a 1-minute job."""
    return int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "100000"))


def run_parallelism_level(cpus: int, n_docs: int) -> dict:
    """Run the full dedup job at one parallelism level in a fresh
    session; returns wall time + throughput. A small warmup run first
    so codegen compilation and Python-worker startup (fixed costs that
    vanish at cluster scale) don't pollute the scaling measurement."""
    from pyspark.sql import SparkSession

    from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
    from lsh_apg_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(f"bench_scaling_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    try:
        warm = _make_pages(spark, 0.002)
        _run_dedup(spark, warm)
        fx = generate_pages(n_docs=n_docs, seed=42)
        pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA) \
            .repartition(max(8, cpus)).localCheckpoint(eager=True)
        n = pages.count()
        t0 = time.monotonic()
        n_clusters = _run_dedup(spark, pages)
        wall = time.monotonic() - t0
        return {"cpus": cpus, "docs": n, "wall_sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1), "rows_out": n_clusters}
    finally:
        spark.stop()


def write_scaling_report(path: str = "BENCH/BASELINE.md") -> dict:
    n_docs = _scaling_docs()
    lo = run_parallelism_level(8, n_docs)
    hi = run_parallelism_level(32, n_docs)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"""# BENCH baseline — scaling evidence (north_rule)

End-to-end dedup (signatures → banding → pairs → verify → CC) on the
deterministic pages corpus ({lo['docs']} docs, frozen config
{CFG.bands}x{CFG.rows_per_band} bands, tau={CFG.tau}), same input at
two parallelism levels on one host (the sandbox stand-in for N vs 4N
executors; no real cluster available):

| parallelism | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[8]  (N)  | {lo['docs']} | {lo['wall_sec']} | {lo['docs_per_sec']} |
| local[32] (4N) | {hi['docs']} | {hi['wall_sec']} | {hi['docs_per_sec']} |

**Scaling efficiency (N -> 4N) = {eff:.3f}** (target >= 0.8; 1.0 = perfect
strong scaling). Codegen/py-worker warmup excluded via a small warmup
run — those are per-executor constants that amortize at cluster scale.

Reference baseline (BASELINE.md): single-node, in-memory, ~60k-100M
float vectors; our target metric is docs/sec end-to-end dedup at
dup-pair recall >= 0.99 (gated in tests/test_pipeline.py at the same
frozen config).
""")
    return {"local8": lo, "local32": hi, "efficiency": round(eff, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    scaling = "--scaling" in sys.argv

    from lsh_apg_spark.session import get_spark
    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))

    # warmup: compile codegen + start python workers on a tiny slice
    warm = _make_pages(spark, 0.002)
    _run_dedup(spark, warm)

    pages = _make_pages(spark, sf)
    n = pages.count()
    t0 = time.monotonic()
    _run_dedup(spark, pages)
    dedup_sec = round(time.monotonic() - t0, 3)

    queries = {"dedup_e2e": dedup_sec}
    queries.update(bench_queries(spark, sf_dir))

    result = {
        "metric": "end_to_end_dedup_wall",
        "value": dedup_sec,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "docs": n,
        "docs_per_sec": round(n / dedup_sec, 1),
        "cpus": cpus,
    }
    if scaling:
        spark.stop()
        result["scaling"] = write_scaling_report()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
