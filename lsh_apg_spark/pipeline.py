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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.operators.banding import explode_buckets
from lsh_apg_spark.operators.components import connected_components
from lsh_apg_spark.operators.pairs import (
    bucket_arrays, bucket_stats_from_groups, candidate_pairs,
)
from lsh_apg_spark.operators.signatures import compute_signatures
from lsh_apg_spark.operators.substring import substring_edges
from lsh_apg_spark.operators.verify import verify_edges
from lsh_apg_spark.sources.checkpoints import CheckpointStore
from lsh_apg_spark.sources.metrics import MetricsSink


@dataclass
class DedupResult:
    signatures: DataFrame
    pairs: DataFrame
    edges: DataFrame          # (a, b, jaccard, hamming) — representative docs
    substring: DataFrame | None  # (a, b, lcs_len) or None
    clusters: DataFrame       # (url, cluster_id) — every input url
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
    materialize_intermediates: bool = True,
) -> DedupResult:
    """``materialize_intermediates=False`` skips the pairs/edges stage
    barriers (each a localCheckpoint + count job) when no checkpoint
    store is attached: every frame is still computed exactly once
    (verify reads pairs once; CC materializes the edge union itself),
    but the per-stage row counts/walls for those two stages are not
    recorded. Use for latency-sensitive small-corpus runs; keep the
    default for observability and any run that resumes."""
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

    all_docs = pages.select(id_col, text_col)

    # stage 0 — exact-duplicate collapse: identical texts (jaccard 1 >=
    # any tau) are folded onto their min-id representative BEFORE the
    # LSH stages. Web corpora are exact-dup heavy, and identical texts
    # are the worst mega-bucket generators (they collide in EVERY
    # band): collapsing first removes that skew at its source and
    # shrinks all downstream stages; the final expansion join restores
    # every url. Cluster assignments are unchanged — an exact dup
    # always joins its representative's cluster.
    def build_rep_map() -> DataFrame:
        # one scan + one shuffle: window-min over the text hash. The
        # previous groupBy+self-join computed the md5 keying in two
        # plan branches and paid a second shuffle for the join —
        # measured 3-6x slower at 800k docs/local[8] (r4 A/B, outputs
        # identical). Skew note: a window partition group lands on one
        # task (sorter-backed, spills, never OOMs) — linear in the
        # dup-group size over 24-byte rows, fine even for boilerplate
        # pages duplicated 10^7 times; the join form's AQE skew-split
        # is the fallback if a corpus ever breaks that assumption.
        keyed = all_docs.select(
            F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("_k"))
        return keyed.select(
            id_col,
            F.min(id_col).over(Window.partitionBy("_k")).alias("_rep"))

    rep_map = stage("rep_map", build_rep_map)

    # compact 64-bit ids for everything between here and the final
    # url mapping: the banding/pair/CC stages are shuffle- and
    # sort-heavy, and an 8-byte id vs a ~40-60B url string is a ~3x
    # row-width (= memory-bandwidth = shuffle-volume) reduction — the
    # Spark analogue of the reference working on int ids (src/def.h).
    # xxhash64 nid collision failure mode: two DISTINCT documents fuse
    # into one graph node, silently merging their clusters with no
    # content check (verification never sees the pair — they share an
    # id). Probability ~n^2/2^65: negligible for sandbox corpora, and
    # at 10^12 docs the id must widen to 128 bits. A cheap guard for
    # paranoid runs: assert id_map.count() == id_map.select("_nid")
    # .distinct().count().
    id_map = (
        rep_map.filter(F.col(id_col) == F.col("_rep"))
        .select(id_col, F.xxhash64(F.col(id_col), F.lit(17)).alias("_nid"))
    )
    docs = id_map.join(all_docs, id_col).select(
        F.col("_nid").alias("nid"), text_col)

    signatures = stage("signatures", lambda: compute_signatures(
        docs, cfg, id_col="nid", text_col=text_col))
    # the bucket explode is cheap JVM work over the checkpointed
    # signatures — when not persisting for resume, leave it lazy rather
    # than materializing ~bands*(1+probes) rows per doc
    buckets = stage("buckets", lambda: explode_buckets(
        signatures, cfg, id_col="nid"), materialize=store is not None)
    # the multi-member survivor set IS materialized: it is tiny relative
    # to the explode, and candidate_pairs fans out over it from several
    # join branches
    groups = stage("bucket_groups",
                   lambda: bucket_arrays(buckets, cfg, id_col="nid"))
    mat = materialize_intermediates or store is not None
    pairs = stage("pairs", lambda: candidate_pairs(groups, cfg, id_col="nid"),
                  materialize=mat)
    edges = stage("edges", lambda: verify_edges(
        pairs, signatures, cfg, id_col="nid"), materialize=mat)

    sub = None
    if include_substring:
        sub = stage("substring_edges", lambda: substring_edges(
            docs, cfg, id_col="nid", text_col=text_col))

    def build_clusters() -> DataFrame:
        e = edges.select("a", "b")
        if sub is not None:
            e = e.unionByName(sub.select("a", "b"))
        nid_clusters = connected_components(
            e, nodes=docs.select("nid"), id_col="nid")
        # nid component labels -> deterministic url labels: cluster_id
        # = min member url of the component, as a window-min over the
        # label (one shuffle; component labels being arbitrary nids
        # never leak out — same one-pass rationale as build_rep_map)
        members = nid_clusters.withColumnRenamed("cluster_id", "_lab") \
            .withColumnRenamed("nid", "_nid").join(id_map, "_nid")
        rep_clusters = members.select(
            F.col(id_col).alias("_rep"),
            F.min(id_col).over(Window.partitionBy("_lab"))
            .alias("cluster_id"))
        # expand representative clusters back to every url; the rep is
        # its exact-group's min url, so cluster_id == global min member
        return rep_map.join(rep_clusters, "_rep").select(id_col, "cluster_id")

    clusters = stage("clusters", build_clusters)

    def _edges_with_urls(df: DataFrame | None) -> DataFrame | None:
        """Map nid edge endpoints back to urls for the exposed result
        (lazy — only pays its joins if a consumer materializes it)."""
        if df is None:
            return None
        ua = id_map.select(F.col("_nid").alias("a"),
                           F.col(id_col).alias("_ua"))
        ub = id_map.select(F.col("_nid").alias("b"),
                           F.col(id_col).alias("_ub"))
        others = [c for c in df.columns if c not in ("a", "b")]
        return (
            df.join(ua, "a").join(ub, "b")
            .select(F.least("_ua", "_ub").alias("a"),
                    F.greatest("_ua", "_ub").alias("b"), *others)
        )

    # skew observability: bucket-size distribution into metrics,
    # derived from the small materialized survivor set (the full
    # explode count is docs x bands x (1+probes), known arithmetically)
    n_rep_docs = next(m["rows"] for m in metrics if m["stage"] == "signatures")
    total_bucket_rows = n_rep_docs * cfg.bands * (1 + cfg.num_probes)
    stats = bucket_stats_from_groups(
        groups, cfg, total_bucket_rows).collect()[0].asDict()
    metrics.append({"stage": "bucket_stats", **stats})
    if sink is not None:
        sink.log("bucket_stats", **stats)

    return DedupResult(signatures=signatures,
                       pairs=_edges_with_urls(pairs),
                       edges=_edges_with_urls(edges),
                       substring=_edges_with_urls(sub),
                       clusters=clusters, metrics=metrics)


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
