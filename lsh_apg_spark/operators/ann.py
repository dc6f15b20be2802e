"""ANN-mode operators over embedding columns — the reference's native
domain (float-vector kNN, src/def.h:5-14). Two paths:

* brute-force exact top-k (the golden baseline, maps ben_make,
  src/Preprocess.cpp:107-142, and the flagship query's exact re-rank);
* random-hyperplane LSH bucketed top-k (the scale path: signatures →
  banding → exact re-rank of candidates only — the same
  candidates-then-verify shape as divGraph::knn, src/divGraph.h:921-1059).

Distances are computed JVM-side (zip_with/aggregate, squared space
end-to-end like USE_SQRDIST, src/def.h:3); the only Python is the
per-batch projection UDF for LSH signatures."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from lsh_apg_spark.functions import vectors


def bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) exact top-k. Broadcast the
    query side: at any scale the query batch is small, so the corpus
    never shuffles (one scan + local top-k per partition via the
    window's partial aggregation)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    pair_score = vectors.make_pair_score_udf(
        "cosine" if metric == "cosine" else "l2_sq")
    score = (pair_score(F.col("_qv"), F.col("_cv")) if metric == "cosine"
             else -pair_score(F.col("_qv"), F.col("_cv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


def make_projection_udf(dim: int, n_planes: int, seed: int):
    """array<float> -> array<int> of sign bits under seeded random
    hyperplanes — the batched analogue of calHash (src/e2lsh.cpp:62-69):
    one numpy matmul per Arrow batch."""

    @F.pandas_udf(ArrayType(IntegerType(), False))
    def project(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((dim, n_planes))
        for vecs in it:
            mat = np.stack(vecs.to_numpy())
            bits = (mat @ planes > 0).astype(np.int32)
            yield pd.Series(list(bits))

    return project


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-LSH banding generates candidates, exact
    cosine re-ranks them (reference shape: LSH seeds → exact re-rank,
    divGraph::knn steps 2-7, src/divGraph.h:921-1059)."""
    n_planes = bands * rows_per_band
    project = make_projection_udf(dim, n_planes, seed)

    def to_buckets(df: DataFrame, role: str) -> DataFrame:
        sig = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"_{role}v"),
            project(F.col(vec_col)).alias("_bits"),
        )
        bhs = F.array(*[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(F.lit(band), F.slice(
                    "_bits", band * rows_per_band + 1, rows_per_band))
                 .alias("bhash"),
            )
            for band in range(bands)
        ])
        return (
            sig.select(f"{role}_id", f"_{role}v", F.explode(bhs).alias("bp"))
            .select(f"{role}_id", f"_{role}v", "bp.band", "bp.bhash")
        )

    qb = to_buckets(queries, "query")
    cb = to_buckets(corpus, "neighbor")
    pair_score = vectors.make_pair_score_udf("cosine")
    cands = (
        qb.join(cb, ["band", "bhash"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", pair_score(F.col("_queryv"), F.col("_neighborv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


def ann_recall(approx: DataFrame, exact: DataFrame) -> float:
    """Recall of approx top-k vs exact top-k (maps Performance::update,
    src/Query.cpp:58-66): |found ∩ golden| / |golden|."""
    hit = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return hit / total if total else 1.0
