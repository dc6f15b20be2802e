"""End-to-end dedup pipeline orchestration (the Spark analogue of the
reference's main build+query program, src/main.cpp:11-230, recast as
the staged dataflow of SURVEY.md §3.4):

  pages ─► signatures ─► buckets ─► pairs ─► edges ─► clusters
                                 └► substring edges (winnowing) ──┘

Every stage optionally checkpoints through CheckpointStore (resume =
the reference's cache-or-build ben_create / index save-load) and logs
row counts + wall time to the MetricsSink."""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.operators.banding import explode_buckets
from lsh_apg_spark.operators.components import connected_components
from lsh_apg_spark.operators.pairs import bucket_stats, candidate_pairs
from lsh_apg_spark.operators.signatures import compute_signatures
from lsh_apg_spark.operators.substring import substring_edges
from lsh_apg_spark.operators.verify import prefilter_pairs, verify_edges
from lsh_apg_spark.sources.checkpoints import CheckpointStore
from lsh_apg_spark.sources.metrics import MetricsSink


@dataclass
class DedupResult:
    signatures: DataFrame
    pairs: DataFrame
    edges: DataFrame          # (a, b, jaccard, hamming)
    substring: DataFrame | None  # (a, b, lcs_len) or None
    clusters: DataFrame       # (url, cluster_id)
    metrics: list[dict]


def run_dedup(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    metrics_path: str | None = None,
    include_substring: bool = True,
) -> DedupResult:
    cfg = cfg or DedupConfig()
    store = CheckpointStore(spark, checkpoint_dir, cfg) if checkpoint_dir else None
    sink = MetricsSink(metrics_path) if metrics_path else None
    metrics: list[dict] = []

    def stage(name: str, builder, materialize: bool = True) -> DataFrame:
        t0 = time.monotonic()
        if store is not None:
            resumed = store.exists(name)
            df = store.get_or_create(name, builder)
            rows = store.lineage(name)["rows"]
            row = {"rows": rows, "resumed": resumed,
                   "wall_sec": round(time.monotonic() - t0, 3)}
        else:
            df = builder()
            if materialize:
                # truncate lineage between shuffle-heavy stages
                df = df.localCheckpoint(eager=True)
            row = {"rows": df.count() if materialize else None,
                   "resumed": False,
                   "wall_sec": round(time.monotonic() - t0, 3)}
        metrics.append({"stage": name, **row})
        if sink is not None:
            sink.log(name, **row)
        return df

    docs = pages.select(id_col, text_col)

    signatures = stage("signatures", lambda: compute_signatures(
        docs, cfg, id_col=id_col, text_col=text_col))
    buckets = stage("buckets", lambda: explode_buckets(
        signatures, cfg, id_col=id_col))
    pairs = stage("pairs", lambda: candidate_pairs(buckets, cfg, id_col=id_col))
    edges = stage("edges", lambda: verify_edges(
        prefilter_pairs(pairs, signatures, cfg, id_col=id_col),
        docs, cfg, id_col=id_col, text_col=text_col))

    sub = None
    if include_substring:
        sub = stage("substring_edges", lambda: substring_edges(
            docs, cfg, id_col=id_col, text_col=text_col))

    def build_clusters() -> DataFrame:
        e = edges.select("a", "b")
        if sub is not None:
            e = e.unionByName(sub.select("a", "b"))
        return connected_components(
            e, nodes=docs.select(id_col), id_col=id_col)

    clusters = stage("clusters", build_clusters)

    # skew observability: bucket-size distribution into metrics
    stats = bucket_stats(buckets, cfg).collect()[0].asDict()
    metrics.append({"stage": "bucket_stats", **stats})
    if sink is not None:
        sink.log("bucket_stats", **stats)

    return DedupResult(signatures=signatures, pairs=pairs, edges=edges,
                       substring=sub, clusters=clusters, metrics=metrics)


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the driver-provided `documents` table (doc_id, text, lang,
    ...) to the canonical pages shape (input_hint) — deterministic url,
    warc_ts derived from doc_id, html = wrapped text."""
    return docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("doc_id").cast("string"))
         .alias("url"),
        (F.lit("2024-10-08 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit(b"<html><body>"),
            F.encode(F.col("text"), "UTF-8"),
            F.lit(b"</body></html>"),
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
