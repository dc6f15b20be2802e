"""Scalar/vector kernels: numpy cores + their pandas-UDF wrappers and
JVM-side column expressions. No per-row Python anywhere — kernels are
Arrow-batched, everything else is pyspark.sql.functions."""
