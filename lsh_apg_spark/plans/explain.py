"""Helpers over df._jdf physical-plan text: assert that the plan we
shipped is the plan we wanted (filters pushed into the scan, projection
pruned, broadcast where intended, codegen coverage). Used by
tests/test_plans.py — the 'would this survive 100x scale-up' gate."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names inside every parquet scan's ReadSchema — the
    projection that actually hits storage."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            out.extend(f.split(":")[0] for f in inner.split(",") if f)
    return out


def pushed_filters(df: DataFrame) -> str:
    return "\n".join(line.strip() for line in formatted_plan(df).splitlines()
                     if "PushedFilters" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages in the physical
    plan. Spark marks codegen'd operators `*(n) Op` in simple mode and
    `[codegen id : n]` in formatted mode; count distinct stage ids."""
    import re

    ids = set(re.findall(r"\*\((\d+)\)", simple_plan(df)))
    if not ids:
        # AQE wraps the plan in AdaptiveSparkPlan and hides codegen ids
        # until execution; re-plan with AQE off just for the inspection
        spark = df.sparkSession
        key = "spark.sql.adaptive.enabled"
        prev = spark.conf.get(key)
        try:
            spark.conf.set(key, "false")
            # select("*") forces a fresh QueryExecution planned under
            # the toggled conf (the original one is already memoized)
            plan = df.select("*")._jdf.queryExecution() \
                .executedPlan().toString()
        finally:
            spark.conf.set(key, prev)
        ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
