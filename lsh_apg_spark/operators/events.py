"""Event-log operators: tumbling-window aggregation, gap-based
sessionization, JSON property extraction.

The reference has no time/window operators (SURVEY.md §2.8-2.10) —
these extend the engine to the event-stream side of a training-data
pipeline. Every transformation here is a pure DataFrame program
(whole-stage codegen, no Python), and `windowed_event_stats` is
batch/stream agnostic: the same function is applied to a streaming
DataFrame in lsh_apg_spark.streaming.windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def windowed_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.
    (window_start, event_type, n_events, sum_value)."""
    return (
        events.groupBy(
            F.window("ts", window).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the user's previous event exceeds the gap. Returns
    one row per session: (user_id, session_id, n_events,
    session_start, session_end).

    Two analytic windows over the same (user_id, ts) ordering — one
    shuffle on user_id, both window passes colocated."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    # NTZ timestamps can't cast straight to long; route through LTZ
    # (session tz is pinned UTC, so this is deterministic)
    epoch = F.col("ts").cast("timestamp").cast("long")
    with_breaks = events.withColumn(
        "_new_session",
        F.when(
            epoch - F.lag(epoch).over(by_user) > gap_sec,
            1,
        ).otherwise(0).cast("int"),
    ).withColumn(
        "session_id",
        F.sum("_new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_breaks.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def json_prop_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Extract an integer property from the JSON `props` column and
    aggregate per event_type: (event_type, n_events, avg_prop).
    get_json_object is JVM-side — no Python in the path."""
    prop = F.get_json_object("props", f"$.{key}").cast("int")
    return (
        events.withColumn("_p", prop)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("_p"), 4).alias("avg_prop"),
        )
    )
