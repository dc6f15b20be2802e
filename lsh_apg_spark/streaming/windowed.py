"""Structured Streaming face of the event operators: the SAME
transformation function as the batch path (operators/events.py),
applied to a readStream source with a watermark for late data.

The reference is a batch engine (SURVEY.md §2.10); this module is the
engine's extension point for continuous ingestion: at production scale
the source is a Kafka/Iceberg changelog stream and the sink an Iceberg
table with `trigger(availableNow=True)` incremental runs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_apg_spark.operators.events import windowed_event_stats

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_events_from_parquet(spark: SparkSession, path: str,
                               max_files_per_trigger: int = 4) -> DataFrame:
    """File-based streaming source over an events parquet directory —
    the sandbox stand-in for a Kafka topic."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_stream(events_stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation: identical semantics to
    the batch `windowed_event_stats` once the stream is drained (the
    watermark only bounds state, it drops nothing under availableNow
    over a finite directory)."""
    return windowed_event_stats(
        events_stream.withWatermark("ts", watermark), window=window)


def run_available_now(stream_df: DataFrame, query_name: str,
                      timeout_sec: int = 120):
    """Drain a finite stream into an in-memory sink (tests) and return
    the completed StreamingQuery; caller reads via
    spark.table(query_name)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
