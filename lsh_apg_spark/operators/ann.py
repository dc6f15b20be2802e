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


def _nearest_cells_udf(centroids: np.ndarray, nprobe: int):
    """array<float> -> array<int>: ids of the `nprobe` nearest centroids
    (one numpy matmul per Arrow batch; centroids ride the closure —
    the broadcast-small-model pattern, like the reference's HashParam)."""

    @F.pandas_udf(ArrayType(IntegerType(), False))
    def nearest(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        for vecs in it:
            mat = np.stack(vecs.to_numpy())
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ c.T
            order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pd.Series(list(order))

    return nearest


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: init = the n_cells vectors with
    the smallest xxhash64(id, seed) (a seeded sample, order-independent),
    then `iters` Lloyd rounds where the assignment runs distributed (UDF
    batch matmul) and the per-cell means reduce via posexplode/groupBy —
    only (n_cells x dim) numbers ever reach the driver."""
    init = (
        corpus.select(F.col(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h").limit(n_cells).collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assign = _nearest_cells_udf(centroids, 1)
        means = (
            corpus.select(F.col(vec_col).alias("v"))
            .withColumn("cell", F.element_at(assign(F.col("v")), 1))
            .select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos").agg(F.avg("val").alias("m"))
            .collect()
        )
        new = centroids.copy()  # empty cells keep their old centroid
        for r in means:
            new[r["cell"], r["pos"]] = r["m"]
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells
    inverted lists, probe the query's nprobe nearest cells, exact
    cosine re-rank within them. The candidates-then-verify shape again
    (SURVEY.md §3.2) with a learned partitioner instead of hash
    buckets; at 10^12 scale the corpus side would be written out
    bucketed by `cell` so a query touches nprobe/n_cells of the data."""
    centroids = train_ivf_centroids(
        corpus, n_cells, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col)

    assign1 = _nearest_cells_udf(centroids, 1)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
        .withColumn("cell", F.element_at(assign1(F.col("_cv")), 1))
    )
    assign_n = _nearest_cells_udf(centroids, nprobe)
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
        .withColumn("cell", F.explode(assign_n(F.col("_qv"))))
    )
    pair_score = vectors.make_pair_score_udf("cosine")
    cands = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", pair_score(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


def diversified_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    pool_factor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RNG-style diversified top-k (maps A4 chooseNN_div,
    src/divGraph.h:576-628): take a pool of k*pool_factor exact nearest
    candidates, then greedily keep a candidate only if no already-kept
    neighbor is closer to it than the query is — spreading results
    across clusters instead of returning one dense cluster.

    The greedy scan has no Catalyst equivalent (each decision depends
    on the prior kept set), so it runs as applyInPandas per query
    group over the (small) candidate pool — the grouped-map UDTF slot
    of SURVEY.md §2.11."""
    pool = bruteforce_topk(queries, corpus, k=k * pool_factor,
                           id_col=id_col, vec_col=vec_col)
    nvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("_nv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("_qv"))
    joined = pool.join(nvec, "neighbor_id").join(qvec, "query_id")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        vecs = np.stack(pdf["_nv"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        kept: list[int] = []
        for i in range(len(pdf)):
            if len(kept) >= k:
                break
            # cand-to-query distance via the already-computed cosine
            cand_qdist = 1.0 - float(pdf["score"].iloc[i])
            diverse = True
            for j in kept:
                cand_kdist = 1.0 - float(vecs[i] @ vecs[j])
                if cand_kdist < cand_qdist:  # a kept result is closer
                    diverse = False
                    break
            if diverse:
                kept.append(i)
        out = pdf.iloc[kept][["query_id", "neighbor_id", "score"]].copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return joined.groupBy("query_id").applyInPandas(
        pick, schema="query_id long, neighbor_id long, score double, rank long")


def ann_recall(approx: DataFrame, exact: DataFrame) -> float:
    """Recall of approx top-k vs exact top-k (maps Performance::update,
    src/Query.cpp:58-66): |found ∩ golden| / |golden|."""
    hit = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return hit / total if total else 1.0
