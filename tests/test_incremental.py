"""Incremental / streaming dedup tests (maps the reference's online
insert contract, insertLSHRefine src/divGraph.h:471-526): processing a
corpus in micro-batches must produce the SAME final assignment as one
batch run, and re-delivery must be idempotent."""

from __future__ import annotations

import pytest

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
from lsh_apg_spark.pipeline import run_dedup
from lsh_apg_spark.sources.checkpoints import CheckpointStore
from lsh_apg_spark.streaming.incremental import dedup_increment, stream_dedup

CFG = DedupConfig()


@pytest.fixture(scope="module")
def corpus(spark):
    fx = generate_pages(n_docs=120, seed=11)
    return spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA) \
        .localCheckpoint(eager=True)


def _assignments(df):
    return sorted((r["url"], r["cluster_id"]) for r in df.collect())


def test_incremental_equals_batch(spark, corpus, tmp_path):
    batch = run_dedup(spark, corpus, CFG, include_substring=False).clusters
    store = CheckpointStore(spark, str(tmp_path / "inc"), CFG)
    half1 = corpus.limit(60)
    half2 = corpus.subtract(half1)
    dedup_increment(spark, half1, store, CFG)
    final = dedup_increment(spark, half2, store, CFG)
    assert _assignments(final) == _assignments(batch)


def test_incremental_redelivery_idempotent(spark, corpus, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "inc2"), CFG)
    first = dedup_increment(spark, corpus, store, CFG)
    a1 = _assignments(first)
    again = dedup_increment(spark, corpus, store, CFG)  # full re-delivery
    assert _assignments(again) == a1


def test_structured_streaming_drain(spark, corpus, tmp_path):
    """readStream → foreachBatch(dedup_increment) with availableNow:
    drains the drop directory and lands the same assignments."""
    drop = str(tmp_path / "drop")
    corpus.write.mode("overwrite").parquet(drop)
    store = CheckpointStore(spark, str(tmp_path / "state"), CFG)
    q = stream_dedup(spark, drop, store, CFG,
                     stream_checkpoint=str(tmp_path / "sck"))
    q.awaitTermination(300)
    batch = run_dedup(spark, corpus, CFG, include_substring=False).clusters
    assert _assignments(store.read("clusters")) == _assignments(batch)
