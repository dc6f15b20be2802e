"""Per-stage scaling profiler: times isolated sub-operations of the
dedup pipeline at one parallelism level (run it twice, e.g. --cpus 4
and --cpus 16, to see which operation stops scaling — the evidence
VERDICT r1 item 2 demands before optimizing blind).

    python scripts/profile_stages.py --cpus 4  --docs 100000
    python scripts/profile_stages.py --cpus 16 --docs 100000

Prints one JSON line: {"cpus": N, "ops": {op: seconds}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--docs", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lsh_apg_spark.config import DedupConfig
    from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
    from lsh_apg_spark.operators.banding import explode_buckets
    from lsh_apg_spark.operators.components import connected_components
    from lsh_apg_spark.operators.pairs import bucket_arrays, candidate_pairs
    from lsh_apg_spark.operators.signatures import compute_signatures
    from lsh_apg_spark.operators.verify import verify_edges
    from lsh_apg_spark.session import get_spark

    cfg = DedupConfig()
    spark = get_spark(f"profile_{args.cpus}", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, args.cpus))
    ops: dict[str, float] = {}

    def t(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        ops[name] = round(time.monotonic() - t0, 3)
        return out

    # warmup: codegen + python workers
    warm = spark.createDataFrame(
        generate_pages(n_docs=500, seed=1).pages, schema=PAGES_SCHEMA)
    compute_signatures(warm.select("url", "text"), cfg).count()

    fx = generate_pages(n_docs=args.docs, seed=42)
    pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA) \
        .repartition(max(8, args.cpus)).localCheckpoint(eager=True)
    docs = pages.select(
        F.xxhash64("url", F.lit(17)).alias("nid"), "text")
    docs.count()

    # 1. signature UDF alone (count forces full compute, result discarded)
    t("signature_udf", lambda: compute_signatures(
        docs, cfg, id_col="nid").count())
    sigs = compute_signatures(docs, cfg, id_col="nid") \
        .localCheckpoint(eager=True)
    sigs.count()

    # 2. checkpoint scan + band-hash explode, no shuffle
    t("explode_only", lambda: explode_buckets(sigs, cfg, id_col="nid")
      .write.format("noop").mode("overwrite").save())
    buckets = explode_buckets(sigs, cfg, id_col="nid")

    # 3a. window-count grouping (the shipped nonsingleton_buckets path)
    t("window_count", lambda: bucket_arrays(buckets, cfg, id_col="nid")
      .write.format("noop").mode("overwrite").save())
    # 3b. plain groupBy count (partial-agg alternative, for comparison)
    t("groupby_count", lambda: buckets.groupBy("bhash")
      .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 2)
      .write.format("noop").mode("overwrite").save())

    groups = bucket_arrays(buckets, cfg, id_col="nid") \
        .localCheckpoint(eager=True)
    groups.count()

    # 4. pair expansion from materialized groups
    t("pairs", lambda: candidate_pairs(groups, cfg, id_col="nid")
      .write.format("noop").mode("overwrite").save())
    pairs = candidate_pairs(groups, cfg, id_col="nid") \
        .localCheckpoint(eager=True)
    pairs.count()

    # 5. verify join (ships shingle arrays through 2 joins)
    t("verify", lambda: verify_edges(pairs, sigs, cfg, id_col="nid")
      .write.format("noop").mode("overwrite").save())
    edges = verify_edges(pairs, sigs, cfg, id_col="nid") \
        .select("a", "b").localCheckpoint(eager=True)
    edges.count()

    # 6. connected components (driver loop)
    t("cc", lambda: connected_components(
        edges, nodes=docs.select("nid"), id_col="nid").count())

    print(json.dumps({"cpus": args.cpus, "docs": args.docs, "ops": ops}))
    spark.stop()


if __name__ == "__main__":
    main()
