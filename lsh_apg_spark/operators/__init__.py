"""Dataflow operators of the dedup engine, one module per pipeline
stage (SURVEY.md §2 inventory). Each operator is a pure
DataFrame -> DataFrame function; orchestration/checkpointing lives in
lsh_apg_spark.pipeline."""
