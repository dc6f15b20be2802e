"""Connected-components unit tests on hand-built graphs (SURVEY.md §5:
chain, star, two components, singletons) — mirrors the reference's
traverse/connectivity labeling (src/divGraph.h:1233-1333)."""

from __future__ import annotations

from lsh_apg_spark.operators.components import connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "a string, b string")
    n = spark.createDataFrame([(x,) for x in nodes], "url string") if nodes else None
    rows = connected_components(e, nodes=n).collect()
    return {r["url"]: r["cluster_id"] for r in rows}


def test_chain(spark):
    # long chain stresses pointer jumping (worst case for pure propagation)
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(30)]
    out = _cc(spark, edges)
    assert set(out.values()) == {"n000"}
    assert len(out) == 31


def test_star(spark):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    out = _cc(spark, edges)
    assert set(out.values()) == {"hub"}


def test_two_components_and_singleton(spark):
    edges = [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    out = _cc(spark, edges, nodes=["a1", "a2", "a3", "b1", "b2", "lonely"])
    assert out["a1"] == out["a2"] == out["a3"] == "a1"
    assert out["b1"] == out["b2"] == "b1"
    assert out["lonely"] == "lonely"


def test_edge_direction_irrelevant(spark):
    out1 = _cc(spark, [("x", "y"), ("z", "y")])
    out2 = _cc(spark, [("y", "x"), ("y", "z")])
    assert out1 == out2 == {"x": "x", "y": "x", "z": "x"}
