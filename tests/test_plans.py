"""Physical-plan assertions: the plan we ship is the plan we want —
projection pruning into the parquet scan, filter pushdown, broadcast
where intended. These guard the properties that matter at 100x scale
but are invisible in row-count tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.operators.signatures import compute_signatures
from lsh_apg_spark.plans import explain

CFG = DedupConfig()
SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_signature_stage_prunes_scan(spark, docs):
    """The signature stage must read ONLY (doc_id, text) from storage —
    a scan reading lang/source/n_chars for a 2-column map is wrong."""
    sigs = compute_signatures(docs, CFG, id_col="doc_id", text_col="text")
    cols = explain.scan_read_schema(sigs)
    assert set(cols) == {"doc_id", "text"}, cols


def test_filter_pushdown_reaches_scan(spark, docs):
    q = docs.filter(F.col("lang") == "en").select("doc_id")
    plan = explain.formatted_plan(q)
    assert "PushedFilters" in plan
    assert "lang" in explain.pushed_filters(q)


def test_broadcast_small_dimension(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    j = li.join(F.broadcast(n), li.l_suppkey == n.n_nationkey)
    assert explain.has_broadcast_join(j)


def test_verify_prefilter_orders_before_udf(spark):
    """The cheap signature-agreement filter must run before the
    exact-Jaccard Python UDF: the physical plan's Filter on sig_est
    sits below (executes before) the BatchEvalPython/ArrowEvalPython
    node. Catalyst cannot reorder across the UDF boundary, so this is
    OUR ordering and must not regress."""
    from lsh_apg_spark.operators.banding import explode_buckets
    from lsh_apg_spark.operators.pairs import candidate_pairs
    from lsh_apg_spark.operators.verify import prefilter_pairs, verify_edges

    docs = spark.createDataFrame(
        [("u1", "a b c d e f"), ("u2", "a b c d e g")], "url string, text string")
    sigs = compute_signatures(docs, CFG)
    pairs = candidate_pairs(explode_buckets(sigs, CFG), CFG)
    edges = verify_edges(prefilter_pairs(pairs, sigs, CFG), docs, CFG)
    plan = explain.simple_plan(edges)
    udf_pos = max(plan.find("ArrowEvalPython"), plan.find("BatchEvalPython"))
    est_pos = plan.find("sig_est")
    assert udf_pos != -1 and est_pos != -1
    # deeper in the tree = printed later = executes earlier
    assert est_pos > udf_pos, "sig_est filter not below the verify UDF"


def test_codegen_covers_relational_stages(spark, docs):
    agg = docs.groupBy("lang").agg(F.avg("n_chars").alias("a"))
    assert explain.codegen_stage_count(agg) >= 1
