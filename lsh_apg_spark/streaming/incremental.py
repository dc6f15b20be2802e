"""Incremental dedup micro-batches (maps the reference's online insert,
insertLSHRefine src/divGraph.h:471-526, reinterpreted without shared
mutable state — SURVEY.md §2.10).

Per batch of new pages:

  1. anti-join against already-seen urls (idempotent re-delivery);
  2. signatures + bucket rows for the NEW docs only;
  3. candidate pairs = new-vs-all equi-join on bucket keys (the new
     docs probe the existing 'hash table', exactly like the
     reference's per-point searchLSH probe) + new-vs-new pairs;
  4. verify against the union text corpus;
  5. union edges, re-run CC, rewrite cluster assignments.

All state lives in checkpoint tables (signatures/buckets/edges/
clusters + the pages seen so far) — every step is a pure DataFrame
job, so a crashed batch just re-runs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.operators.banding import explode_buckets
from lsh_apg_spark.operators.components import connected_components
from lsh_apg_spark.operators.pairs import candidate_pairs
from lsh_apg_spark.operators.signatures import compute_signatures
from lsh_apg_spark.operators.verify import verify_edges
from lsh_apg_spark.sources.checkpoints import CheckpointStore


def dedup_increment(
    spark: SparkSession,
    new_pages: DataFrame,
    store: CheckpointStore,
    cfg: DedupConfig,
    id_col: str = "url",
    text_col: str = "text",
    metrics: dict | None = None,
    on_mismatch: str = "fail",
    eval_docs: DataFrame | None = None,
) -> DataFrame:
    """Process one batch of new pages; returns the refreshed
    (url, cluster_id) assignment over the whole corpus so far.

    ``metrics``, if given, receives cc_nodes/cc_edges — the size of the
    subgraph the batch actually re-clustered (bounded by TOUCHED
    components + the new docs, not the accumulated corpus) — plus
    contaminated_dropped when ``eval_docs`` is set.

    ``eval_docs``: optional held-out reference set (benchmark/eval
    documents). New docs whose shingle-Jaccard with any eval doc
    reaches cfg.tau are DROPPED at ingest (operators/decontaminate.py
    — the signatures computed for insertion are reused, so the check
    adds only the broadcast eval probe), and never enter the corpus
    state: decontamination-at-ingest for a training pipeline.

    A store whose sidecars were written under a DIFFERENT config or
    schema version is an ERROR by default (``on_mismatch="fail"``):
    the cold-start path would overwrite the accumulated corpus state
    with just this batch, and raw pages are not retained anywhere to
    rebuild it — silent truncation, caught loudly instead (ADVICE r2).
    Pass ``on_mismatch="reset"`` to explicitly discard the old state
    and restart from this batch."""
    new_docs = new_pages.select(id_col, text_col).dropDuplicates([id_col])

    state_status = store.status("docs")
    if state_status == "mismatch":
        if on_mismatch != "reset":
            raise RuntimeError(
                f"incremental store at {store.root} holds state written "
                f"under config {store.lineage('docs').get('config_id')!r} "
                f"but the current config is {store.cfg.config_id()!r}; "
                "continuing would silently discard the accumulated corpus. "
                "Re-run with the original config, or pass "
                "on_mismatch='reset' to intentionally restart state from "
                "this batch.")
        for stage in ("docs", "signatures", "buckets", "edges", "clusters"):
            store.invalidate(stage)
    have_state = store.exists("docs")
    if have_state:
        old_docs = store.read("docs")
        new_docs = new_docs.join(old_docs.select(id_col), id_col, "left_anti")
        old_sigs = store.read("signatures")
        old_buckets = store.read("buckets")
        old_edges = store.read("edges")
    else:
        old_docs = None

    new_sigs = compute_signatures(new_docs, cfg, id_col, text_col)

    if eval_docs is not None:
        from lsh_apg_spark.operators.decontaminate import (
            MAX_BROADCAST_ROWS, _maybe_broadcast, decontaminate_pairs,
        )
        flagged = decontaminate_pairs(
            new_docs, eval_docs, cfg, id_col=id_col, text_col=text_col,
            train_signatures=new_sigs,
        ).select(F.col("train_id").alias(id_col)).distinct() \
            .localCheckpoint(eager=True)
        # measured count gates the broadcast (VERDICT r3 item 5): a
        # batch that is mostly benchmark text flags O(|batch|) ids —
        # above the guard the anti-joins run as shuffles instead of
        # OOMing the driver
        n_flagged = flagged.count()
        if metrics is not None:
            metrics["contaminated_dropped"] = n_flagged
        fl = _maybe_broadcast(flagged, n_flagged, MAX_BROADCAST_ROWS)
        new_docs = new_docs.join(fl, id_col, "left_anti")
        new_sigs = new_sigs.join(fl, id_col, "left_anti")

    new_buckets = explode_buckets(new_sigs, cfg, id_col)

    if have_state:
        all_docs = old_docs.unionByName(new_docs)
        all_sigs = old_sigs.unionByName(new_sigs)
        both = old_buckets.unionByName(new_buckets)
        # new docs PROBE the existing bucket state (the reference's
        # per-point searchLSH insert probe, src/divGraph.h:359-469):
        # only bucket keys that a new doc lands in can mint a new pair,
        # so pair generation runs over that sliver of the bucket table,
        # not the whole corpus
        touched_keys = new_buckets.select("bhash").distinct()
        relevant = both.join(touched_keys, ["bhash"], "left_semi")
        pairs = candidate_pairs(relevant, cfg, id_col)
        new_ids = new_docs.select(F.col(id_col).alias("a"))
        new_ids_b = new_docs.select(F.col(id_col).alias("b"))
        touching_new = pairs.join(new_ids, "a", "left_semi").unionByName(
            pairs.join(new_ids_b, "b", "left_semi")).dropDuplicates(["a", "b"])
    else:
        all_docs = new_docs
        all_sigs = new_sigs
        both = new_buckets
        touching_new = candidate_pairs(new_buckets, cfg, id_col)

    new_edges = verify_edges(touching_new, all_sigs, cfg, id_col)
    edges = (old_edges.unionByName(new_edges).dropDuplicates(["a", "b"])
             if have_state else new_edges)

    # incremental CC (VERDICT r1 item 8): a new edge can only change
    # the components it touches, so the batch re-clusters ONLY the
    # union of (old components containing a new-edge endpoint) and the
    # new docs — everything else keeps its previous label verbatim.
    # The subgraph's old edges are recovered by one endpoint semi-join
    # (both endpoints of an old edge sit in the same old component, so
    # membership of `a` implies membership of the whole edge).
    if have_state and store.exists("clusters"):
        old_clusters = store.read("clusters")
        ne = new_edges.select("a", "b").localCheckpoint(eager=True)
        touched_nodes = (
            ne.select(F.col("a").alias(id_col))
            .unionByName(ne.select(F.col("b").alias(id_col)))
            .distinct()
        )
        touched_cids = (
            old_clusters.join(touched_nodes, id_col, "left_semi")
            .select("cluster_id").distinct()
        )
        untouched = old_clusters.join(touched_cids, "cluster_id", "left_anti")
        affected = (
            old_clusters.join(touched_cids, "cluster_id", "left_semi")
            .select(id_col)
            .unionByName(new_docs.select(id_col))
            .distinct()
        )
        sub_edges = (
            old_edges.select("a", "b")
            .join(affected.select(F.col(id_col).alias("a")), "a", "left_semi")
            .unionByName(ne)
        )
        if metrics is not None:
            metrics["cc_nodes"] = affected.count()
            metrics["cc_edges"] = sub_edges.count()
        sub_clusters = connected_components(
            sub_edges, nodes=affected, id_col=id_col)
        clusters = untouched.unionByName(sub_clusters)
    else:
        if metrics is not None:
            metrics["cc_nodes"] = all_docs.count()
            metrics["cc_edges"] = edges.count()
        clusters = connected_components(
            edges.select("a", "b"), nodes=all_docs.select(id_col),
            id_col=id_col)

    # persist refreshed state: two-phase write_many, because every one
    # of these plans still lazily READS the previous checkpoints —
    # swapping paths one at a time would pull files out from under the
    # later writes (see CheckpointStore.write_many)
    out = store.write_many({
        "docs": all_docs,
        "signatures": all_sigs,
        "buckets": both,
        "edges": edges,
        "clusters": clusters,
    })
    return out["clusters"]


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    store: CheckpointStore,
    cfg: DedupConfig,
    stream_checkpoint: str,
    schema: str = ("url string, warc_ts timestamp, html binary, "
                   "text string, lang string"),
):
    """Structured Streaming wrapper: watch a directory of parquet page
    drops, run dedup_increment per micro-batch. Trigger availableNow
    drains what's there and stops (test/backfill mode); drop the
    trigger for continuous ingestion."""
    src = spark.readStream.schema(schema).parquet(input_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_increment(spark, batch_df, store, cfg)

    return (
        src.writeStream
        .foreachBatch(on_batch)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
    )
