"""Spark-side sweep for the recall >= 0.99 graph operating point on
the bench's clustered corpus (VERDICT r4 item 2). Builds the kNN edge
table once (cached as parquet under /tmp across runs) and evaluates
query-knob configs against the same golden exact top-k — the real
operators, not the numpy replica.

After the r5 bucket-cap salting fix the DEFAULT config already reaches
recall 0.998 @ cost 0.0765 (raising ef/rounds only adds cost — every
upward config plateaus at 0.998), so this sweep walks DOWNWARD:
narrower seeds (probes=0, fewer bands) and smaller ef, chasing the
reference's committed cost 0.0264 at recall >= 0.99.

Usage: python scripts/sweep_graph_spark.py [n_vecs] [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from lsh_apg_spark.operators import ann  # noqa: E402
from lsh_apg_spark.session import get_spark  # noqa: E402


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("sweep-graph", master="local[32]",
                      shuffle_partitions=32)
    e = bench.make_clustered_corpus(spark, n_vecs)
    n = e.count()
    q = e.filter(F.col("vec_id") < n_q)
    exact = ann.bruteforce_topk(q, e, k=10).localCheckpoint(eager=True)

    cache_path = f"/tmp/sweep_edges_T16_b8x4p2_{n_vecs}.parquet"
    if os.path.exists(cache_path):
        edges = spark.read.parquet(cache_path).localCheckpoint(eager=True)
        print(f"== edges from cache: {edges.count()}", flush=True)
    else:
        t0 = time.monotonic()
        edges = ann.build_knn_graph(e, T=16, dim=64, seed=42)
        edges.write.mode("overwrite").parquet(cache_path)
        edges = spark.read.parquet(cache_path).localCheckpoint(eager=True)
        print(f"== build T16 b8x4p2: {edges.count()} edges "
              f"[{time.monotonic() - t0:.1f}s]", flush=True)

    # (name, seed bands, seed rows, seed probes, ef, rounds, margin)
    query_cfgs = [
        ("s8x8p1_ef64_R4_m.15", 8, 8, 1, 64, 4, 0.15),   # current default
        ("s8x8p0_ef48_R4_m.15", 8, 8, 0, 48, 4, 0.15),
        ("s8x8p0_ef32_R4_m.15", 8, 8, 0, 32, 4, 0.15),
        ("s4x8p0_ef48_R4_m.15", 4, 8, 0, 48, 4, 0.15),
        ("s4x8p0_ef32_R4_m.15", 4, 8, 0, 32, 4, 0.15),
        ("s4x8p0_ef24_R3_m.15", 4, 8, 0, 24, 3, 0.15),
        ("s2x8p0_ef32_R4_m.15", 2, 8, 0, 32, 4, 0.15),
        ("s4x10p0_ef48_R4_m.15", 4, 10, 0, 48, 4, 0.15),
        ("s4x8p0_ef48_R4_m.10", 4, 8, 0, 48, 4, 0.10),
    ]
    for name, sb, sr, sp, ef, rounds, margin in query_cfgs:
        s: dict = {}
        t0 = time.monotonic()
        approx = ann.graph_topk(
            q, e, k=10, dim=64, edges=edges, bands=sb, rows_per_band=sr,
            num_probes=sp, ef=ef, rounds=rounds, prune_margin=margin,
            stats=s).localCheckpoint(eager=True)
        wall = time.monotonic() - t0
        ev = ann.ann_eval(approx, exact,
                          n_candidates=s.get("n_candidates"),
                          corpus_size=n)
        print(json.dumps({
            "query": name, **ev, "wall": round(wall, 1),
            "n_pruned": s.get("n_pruned"),
            "avg_hop": s.get("avg_hop"),
            "avg_admitted": s.get("avg_admitted")}), flush=True)


if __name__ == "__main__":
    main()
