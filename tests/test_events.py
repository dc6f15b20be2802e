"""Event operators: windowed aggregation (batch == stream), gap
sessionization invariants, JSON extraction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lsh_apg_spark.operators.events import (
    json_prop_stats,
    sessionize,
    windowed_event_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_windowed_counts_conserve_rows(spark, events):
    total = events.count()
    agg = windowed_event_stats(events)
    assert agg.agg(F.sum("n_events")).collect()[0][0] == total


def test_sessionize_gap_semantics(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: two sessions split by a 31-minute gap
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + 5 * m, 1, "a", 1.0, "{}"),
        (3, t0 + 36 * m, 1, "a", 1.0, "{}"),
        # user 2: one session, exactly-30-min gap does NOT split
        (4, t0, 2, "a", 1.0, "{}"),
        (5, t0 + 30 * m, 2, "a", 1.0, "{}"),
    ]
    out = {(r.user_id, r.session_id): r.n_events
           for r in sessionize(_mk(spark, rows), gap_minutes=30).collect()}
    assert out == {(1, 0): 2, (1, 1): 1, (2, 0): 2}


def test_sessionize_conserves_events(spark, events):
    s = sessionize(events)
    assert s.agg(F.sum("n_events")).collect()[0][0] == events.count()
    bad = s.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_json_prop_stats(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "x", 0.0, '{"k": 10}'),
        (2, dt.datetime(2024, 1, 1), 1, "x", 0.0, '{"k": 20}'),
        (3, dt.datetime(2024, 1, 1), 1, "y", 0.0, '{"k": 7}'),
    ]
    out = {r.event_type: (r.n_events, r.avg_prop)
           for r in json_prop_stats(_mk(spark, rows)).collect()}
    assert out == {"x": (2, 15.0), "y": (1, 7.0)}


def test_stream_matches_batch(spark, events, tmp_path):
    """Structured Streaming over the same files, drained with
    availableNow, must equal the batch aggregation exactly."""
    from lsh_apg_spark.streaming.windowed import (
        run_available_now,
        stream_events_from_parquet,
        windowed_stream,
    )
    src = str(tmp_path / "events_src")
    events.repartition(4).write.parquet(src)

    stream = windowed_stream(stream_events_from_parquet(spark, src))
    q = run_available_now(stream, "stream_windowed_test")
    try:
        got = {tuple(r) for r in spark.table("stream_windowed_test").collect()}
        want = {tuple(r) for r in windowed_event_stats(events).collect()}
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_windowed_plan_is_pure_codegen(spark, events):
    """No Python anywhere in the event operators — whole-stage codegen
    with a partial (map-side) aggregation before the shuffle."""
    from lsh_apg_spark.plans import explain
    plan = explain.simple_plan(windowed_event_stats(events))
    assert "EvalPython" not in plan
    assert "partial" in plan  # map-side combine present
