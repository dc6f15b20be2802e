"""JVM-side vector math over ARRAY<FLOAT/DOUBLE> embedding columns.

Used by the ANN-mode operators (the reference's native domain:
float-vector kNN, src/def.h:5-14). All expressions are built-in
higher-order functions (zip_with / aggregate) so they run inside
whole-stage codegen — no Python in the distance path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product (maps cal_inner_product, src/basis.h:168-175)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column | str) -> Column:
    """Squared L2 norm (maps cal_lengthSquare, src/basis.h:177-184)."""
    return F.aggregate(
        _c(a),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance — like the reference we stay in squared space
    end-to-end (USE_SQRDIST, src/def.h:3) and only sqrt at report time."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with double accumulation."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))
