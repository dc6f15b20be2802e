"""A/B/C measurement of the verify-stage payload strategy (VERDICT r1
item 6): what should ride the candidate-pair join?

  A. full distinct shingle-hash set (shipped; exact Jaccard, the only
     form that reproduces the brute-force oracle bit-for-bit);
  B. bottom-k shingle sketch (bounded row width; Jaccard becomes a
     +-1/sqrt(k) ESTIMATE — breaks the exact-oracle equality the
     CORRECTNESS gate and the tau threshold contract rely on);
  C. no shingle column at all — join the pair back to the raw texts
     and recompute shingles per pair in a pandas UDF (exact, but
     Python in the per-pair path).

Run:  python scripts/ab_verify.py --docs 400000 --cpus 16
Emits one JSON line with per-variant verify wall seconds + agreement
stats vs variant A. The decision recorded in BASELINE.md: A ships.
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
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sketch-k", type=int, default=128)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lsh_apg_spark.config import DedupConfig
    from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
    from lsh_apg_spark.functions.minhash import make_jaccard_udf
    from lsh_apg_spark.operators.banding import explode_buckets
    from lsh_apg_spark.operators.pairs import bucket_arrays, candidate_pairs
    from lsh_apg_spark.operators.signatures import compute_signatures
    from lsh_apg_spark.operators.verify import verify_edges
    from lsh_apg_spark.session import get_spark

    cfg = DedupConfig()
    spark = get_spark(f"ab_verify_{args.cpus}", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, args.cpus))

    fx = generate_pages(n_docs=args.docs, seed=42)
    pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA) \
        .repartition(max(8, args.cpus)).localCheckpoint(eager=True)
    docs = pages.select(F.xxhash64("url", F.lit(17)).alias("nid"), "text")
    keyed = docs.select("nid", F.md5(F.col("text").cast("binary")).alias("_k"))
    reps = keyed.groupBy("_k").agg(F.min("nid").alias("_rep"))
    rep_docs = keyed.join(reps, "_k").filter(F.col("nid") == F.col("_rep")) \
        .join(docs, "nid").select("nid", "text").localCheckpoint(eager=True)
    sigs = compute_signatures(rep_docs, cfg, id_col="nid") \
        .localCheckpoint(eager=True)
    sigs.count()
    groups = bucket_arrays(explode_buckets(sigs, cfg, id_col="nid"),
                           cfg, id_col="nid").localCheckpoint(eager=True)
    pairs = candidate_pairs(groups, cfg, id_col="nid") \
        .localCheckpoint(eager=True)
    n_pairs = pairs.count()

    def timed(fn):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 2)

    # warmup
    verify_edges(pairs.limit(500), sigs, cfg, id_col="nid") \
        .write.format("noop").mode("overwrite").save()

    # A: shipped full-set exact verify
    t_a = timed(lambda: verify_edges(pairs, sigs, cfg, id_col="nid"))

    # B: bottom-k sketch estimate (bottom-k by hash value = the k
    # smallest of the sorted distinct hash set; estimator: fraction of
    # the k smallest of the UNION that lie in the intersection)
    k = args.sketch_k
    sk = sigs.select("nid", F.slice(F.array_sort("shingles"), 1, k)
                     .alias("sk"))
    sk_a = sk.select(F.col("nid").alias("a"), F.col("sk").alias("_ka"))
    sk_b = sk.select(F.col("nid").alias("b"), F.col("sk").alias("_kb"))

    def variant_b():
        u = F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k)
        est = (F.size(F.array_intersect(u, F.array_intersect("_ka", "_kb")))
               / F.least(F.lit(k), F.size(u)))
        return (
            pairs.join(sk_a, "a").join(sk_b, "b")
            .withColumn("jaccard_est", est)
            .filter(F.col("jaccard_est") >= cfg.tau)
            .select("a", "b", "jaccard_est")
        )

    t_b = timed(variant_b)

    # C: per-pair text recompute (exact, Python in the pair path)
    jac = make_jaccard_udf(cfg)
    txt_a = rep_docs.select(F.col("nid").alias("a"), F.col("text").alias("_ta"))
    txt_b = rep_docs.select(F.col("nid").alias("b"), F.col("text").alias("_tb"))

    def variant_c():
        return (
            pairs.join(txt_a, "a").join(txt_b, "b")
            .withColumn("jaccard", jac("_ta", "_tb"))
            .filter(F.col("jaccard") >= cfg.tau)
            .select("a", "b", "jaccard")
        )

    t_c = timed(variant_c)

    # agreement of B vs A on the decision boundary
    ea = verify_edges(pairs, sigs, cfg, id_col="nid").select("a", "b") \
        .localCheckpoint(eager=True)
    eb = variant_b().select("a", "b").localCheckpoint(eager=True)
    n_a, n_b = ea.count(), eb.count()
    both = ea.join(eb, ["a", "b"], "left_semi").count()

    print(json.dumps({
        "docs": args.docs, "cpus": args.cpus, "pairs": n_pairs,
        "verify_sec": {"A_full_set": t_a, "B_bottomk_sketch": t_b,
                       "C_text_recompute": t_c},
        "sketch_k": k,
        "edges": {"A": n_a, "B": n_b, "B_intersect_A": both,
                  "B_false_neg": n_a - both, "B_false_pos": n_b - both},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
