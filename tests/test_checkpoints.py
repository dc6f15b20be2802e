"""Checkpoint/resume contract tests (maps S4-S8 cache-or-build,
src/Preprocess.cpp:227-254): resumed runs are byte-identical; a config
change invalidates the cache."""

from __future__ import annotations

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.fixtures import PAGES_SCHEMA, generate_pages
from lsh_apg_spark.pipeline import run_dedup
from lsh_apg_spark.sources.checkpoints import CheckpointStore

CFG = DedupConfig()


def test_store_roundtrip_and_lineage(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "s"), CFG)
    df = spark.range(100).withColumnRenamed("id", "x")
    calls = []

    def build():
        calls.append(1)
        return df

    out1 = store.get_or_create("t", build)
    out2 = store.get_or_create("t", build)
    assert len(calls) == 1, "second call must resume, not rebuild"
    assert out1.count() == out2.count() == 100
    lin = store.lineage("t")
    assert lin["rows"] == 100 and lin["config_id"] == CFG.config_id()
    assert sum(p["rows"] for p in lin["partitions"]) == 100


def test_config_change_invalidates(spark, tmp_path):
    root = str(tmp_path / "s2")
    store = CheckpointStore(spark, root, CFG)
    store.write(spark.range(5), "t")
    assert store.exists("t")
    other = CheckpointStore(spark, root, DedupConfig(tau=0.9))
    assert not other.exists("t"), "different config must not resume"


def test_pipeline_resume_identical(spark, tmp_path):
    """North-rule resume: second run reuses every stage and produces
    byte-identical assignments."""
    fx = generate_pages(n_docs=80, seed=7)
    pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA)
    ckpt = str(tmp_path / "ckpt")
    r1 = run_dedup(spark, pages, CFG, checkpoint_dir=ckpt,
                   include_substring=False)
    first = sorted((r["url"], r["cluster_id"]) for r in r1.clusters.collect())
    r2 = run_dedup(spark, pages, CFG, checkpoint_dir=ckpt,
                   include_substring=False)
    resumed = {m["stage"]: m.get("resumed") for m in r2.metrics
               if "resumed" in m}
    for s in ["signatures", "buckets", "pairs", "edges", "clusters"]:
        assert resumed[s], f"stage {s} was rebuilt: {resumed}"
    second = sorted((r["url"], r["cluster_id"]) for r in r2.clusters.collect())
    assert first == second
