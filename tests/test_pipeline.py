"""End-to-end pipeline tests against the brute-force golden oracle —
the Spark mirror of the reference's recall evaluation
(Performance::update, src/Query.cpp:9-67; gate: dup-pair recall >= 0.99
at the frozen config)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.fixtures import (
    PAGES_SCHEMA, generate_pages, golden_clusters, golden_pairs,
)
from lsh_apg_spark.pipeline import run_dedup

CFG = DedupConfig()
# hot group is near-identical (distinct texts) so it survives the
# exact-dup collapse; 2x bucket_cap members keeps its LSH buckets above
# the cap even though band membership is probabilistic (~0.5-0.7 of the
# group per bucket), so the main run exercises salting + rep chains
HOT = CFG.bucket_cap * 2


@pytest.fixture(scope="module")
def fixture_bundle(spark):
    fx = generate_pages(n_docs=360, seed=42, hot_group_size=HOT)
    gp = golden_pairs(fx.pages, CFG)
    gc = golden_clusters(fx.pages, gp)
    pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA)
    return fx, gp, gc, pages


@pytest.fixture(scope="module")
def result(spark, fixture_bundle):
    _, _, _, pages = fixture_bundle
    return run_dedup(spark, pages, CFG, include_substring=False)


def test_recall_gate(fixture_bundle, result):
    """Dup-pair recall >= 0.99 vs the brute-force exact-Jaccard oracle.

    A golden pair counts as found iff both members share a cluster —
    the reference's connectivity semantics (divGraph.h:1233-1333):
    capped/salted mega-buckets intentionally emit O(n) of their O(n^2)
    internal edges, and transitive closure recovers the rest."""
    _, gp, _, _ = fixture_bundle
    golden = set(zip(gp["a"], gp["b"]))
    assert golden, "oracle produced no dup pairs — fixture broken"
    cl = {r["url"]: r["cluster_id"] for r in result.clusters.collect()}
    found = sum(1 for a, b in golden if cl[a] == cl[b])
    recall = found / len(golden)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(golden)} golden)"


def test_no_false_positives(fixture_bundle, result):
    """Every emitted edge is a true >=tau pair (verification is exact)."""
    _, gp, _, _ = fixture_bundle
    golden = set(zip(gp["a"], gp["b"]))
    found = {(r["a"], r["b"]) for r in result.edges.select("a", "b").collect()}
    assert found <= golden, f"false positives: {sorted(found - golden)[:5]}"


def test_cluster_parity(fixture_bundle, result):
    """(url, cluster_id) matches union-find over the golden pairs —
    cluster_id = min member url (deterministic tie-break)."""
    _, _, gc, _ = fixture_bundle
    ours = {r["url"]: r["cluster_id"] for r in result.clusters.collect()}
    golden = dict(zip(gc["url"], gc["cluster_id"]))
    assert set(ours) == set(golden)
    mismatches = {u for u in golden if ours[u] != golden[u]}
    assert not mismatches, f"{len(mismatches)} cluster mismatches"


def test_edge_invariants(result):
    """Mirror of the reference's runtime invariants: no duplicate
    pairs, no self-pairs, canonical order (src/Query.cpp:62,
    src/divGraph.h:1162)."""
    e = result.edges
    n = e.count()
    assert e.dropDuplicates(["a", "b"]).count() == n
    assert e.filter(F.col("a") >= F.col("b")).count() == 0
    assert e.filter((F.col("jaccard") < CFG.tau) | (F.col("jaccard") > 1.0)).count() == 0


def test_every_url_assigned_once(fixture_bundle, result):
    _, _, _, pages = fixture_bundle
    n_docs = pages.count()
    c = result.clusters
    assert c.count() == n_docs
    assert c.select("url").distinct().count() == n_docs


def test_hot_group_salted_and_connected(fixture_bundle, result):
    """The adversarial mega-bucket (identical boilerplate, size >
    bucket_cap) must have been salted AND still resolve into one
    cluster via subgroup-representative chains."""
    fx, _, _, _ = fixture_bundle
    hot = set(fx.hot_group)
    assert len(hot) == HOT > CFG.bucket_cap
    # distinct texts → the collapse stage must NOT fold them
    n_texts = fx.pages[fx.pages["url"].isin(hot)]["text"].nunique()
    assert n_texts == HOT
    stats = next(m for m in result.metrics if m["stage"] == "bucket_stats")
    assert stats["salted_buckets"] > 0, "hot group did not trigger salting"
    rows = result.clusters.filter(F.col("url").isin(list(hot))).collect()
    cluster_ids = {r["cluster_id"] for r in rows}
    assert len(cluster_ids) == 1, f"hot group split into {len(cluster_ids)} clusters"
    # salting must bound candidate volume: << all-pairs of the hot group
    n_pairs = result.pairs.count()
    assert n_pairs < HOT * (HOT - 1) / 2 + 2000, n_pairs


def test_degenerate_corpora(spark):
    """Empty, single-doc, and all-identical corpora flow end-to-end
    (including the substring pass) without special-casing."""
    empty = spark.createDataFrame([], PAGES_SCHEMA)
    r = run_dedup(spark, empty, CFG)
    assert r.clusters.count() == 0

    one = spark.createDataFrame(
        [("u1", None, None, "just one document here", "en")], PAGES_SCHEMA)
    r = run_dedup(spark, one, CFG)
    assert [(x["url"], x["cluster_id"]) for x in r.clusters.collect()] \
        == [("u1", "u1")]

    same = spark.createDataFrame(
        [(f"u{i}", None, None, "identical text for everyone", "en")
         for i in range(5)], PAGES_SCHEMA)
    r = run_dedup(spark, same, CFG)
    ids = {x["cluster_id"] for x in r.clusters.collect()}
    assert ids == {"u0"} and r.clusters.count() == 5


def test_substring_pass(spark, fixture_bundle):
    """Planted containment pairs (verbatim span inside unrelated
    boilerplate) are caught by winnowing + exact LCS verify."""
    fx, _, _, pages = fixture_bundle
    from lsh_apg_spark.operators.substring import substring_edges

    edges = substring_edges(pages, CFG)
    rows = edges.collect()
    found = {(r["a"], r["b"]) for r in rows}
    planted = set(fx.substring_pairs)
    assert planted, "fixture planted no substring pairs"
    missed = planted - found
    assert not missed, f"substring pairs missed: {sorted(missed)[:5]}"
    assert all(r["lcs_len"] >= CFG.min_substring_len for r in rows)


def test_generate_pages_chunked_parallel_deterministic():
    """Chunked parallel fixture generation (VERDICT r4 item 5): the
    corpus is a function of (n_docs, seed, chunk_docs) — NOT of the
    worker count — ids stay globally unique across chunks, and the
    planted structure survives concatenation."""
    a = generate_pages(n_docs=900, seed=42, n_jobs=2, chunk_docs=300)
    b = generate_pages(n_docs=900, seed=42, n_jobs=4, chunk_docs=300)
    assert a.pages.equals(b.pages)
    assert len(a.pages) == 900
    assert a.pages["url"].is_unique
    # per-chunk planted structure: 3 chunks -> 3 hot groups' worth of
    # urls, and every planted url exists in the corpus
    urls = set(a.pages["url"])
    assert a.hot_group and set(a.hot_group) <= urls
    assert a.exact_groups and all(set(g) <= urls for g in a.exact_groups)
    # n_jobs=1 at sub-chunk size is the byte-identical legacy path
    c = generate_pages(n_docs=200, seed=42)
    d = generate_pages(n_docs=200, seed=42, n_jobs=8, chunk_docs=300)
    assert c.pages.equals(d.pages)


def test_write_pages_parquet_matches_inmemory(spark, tmp_path):
    """The disk-chunked corpus writer (used by the scaling harness at
    sizes where createDataFrame's driver-side Arrow conversion OOMs)
    produces row-identical data to the in-memory chunked generator,
    through a real Spark parquet scan (timestamp precision included)."""
    from lsh_apg_spark.fixtures import write_pages_parquet

    out = str(tmp_path / "pages_pq")
    write_pages_parquet(900, 42, out, n_jobs=3, chunk_docs=300)
    df = spark.read.parquet(out)
    fx = generate_pages(n_docs=900, seed=42, n_jobs=2, chunk_docs=300)
    mem = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA)
    assert df.count() == 900
    assert df.exceptAll(mem).count() == 0
    assert mem.exceptAll(df).count() == 0


def test_driver_contract_full_oracle_coverage():
    """Round-5 invariant: EVERY queries() entry has a DuckDB oracle
    (the formerly rows-only hash/quantizer-seeded family was converted
    via plane/sketch fixtures, the md5-re-frozen IVF init, unrolled
    bounded-loop replays and margin guards). A new entry landing
    without its oracle — or an oracle for a renamed/removed query —
    fails here before the driver's correctness run ever sees it."""
    import __spark_entry__ as entrymod

    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
