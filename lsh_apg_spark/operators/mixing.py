"""Deterministic corpus-mixture sampling — the source-weighting step
of a training-data pipeline (The Pile / Dolma style: combine web,
books, code, ... at prescribed rates). Each document is kept with
probability rates[source], decided by a uniform hash of its OWN id, so
the draw is reproducible row-locally: no RNG state, no seed plumbing,
the same document gets the same verdict on every engine and every
rerun, and adding a source never perturbs another source's sample.

The reference has no mixing stage (its unit is the vector); this
operator serves the engine's web-corpus target the same way the
curation family does (SURVEY.md beyond-reference table).

Mechanism: u = first 13 hex digits of md5(id) — 52 uniform bits —
compared LEXICOGRAPHICALLY against a per-source threshold string
precomputed on the driver as hex13(floor(rate * 2^52)). Lowercase hex
strings of equal length order exactly like the numbers they encode,
so the comparison is pure string <, portable verbatim to the DuckDB
oracle (no hex->int conversion, which engines disagree on). rate=1.0
maps to the sentinel "g", which is > every hex character, so a
full-rate source keeps every row including md5 prefix "fff...".

Scale shape: one per-row JVM expression chain (md5 + substring +
string compare against a CASE of literals) — zero shuffles, zero
Python, no state; Catalyst folds the threshold CASE per row and the
filter pushes to the scan boundary like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_BITS = 52  # 13 hex digits; floor(rate * 2^52) is exact in a float


def mix_threshold(rate: float) -> str:
    """Driver-side threshold literal for one source's keep rate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    n = int(rate * (1 << _HEX_BITS))
    if n >= (1 << _HEX_BITS):
        return "g"  # > 'f': keeps every row, see module docstring
    return format(n, "013x")


def corpus_mix(docs: DataFrame, rates: dict[str, float],
               source_col: str = "source",
               id_col: str = "doc_id") -> DataFrame:
    """Every input row with a ``keep`` verdict: true iff the uniform
    52-bit hash fraction of ``id_col`` falls under its source's rate.
    Sources absent from ``rates`` keep nothing (rate 0) — an unknown
    source silently flooding the mixture is the failure mode this
    default guards against; pass an explicit rate to admit it."""
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 13)
    thr = F.lit(mix_threshold(0.0))
    for src, rate in sorted(rates.items()):
        thr = F.when(F.col(source_col) == src,
                     F.lit(mix_threshold(rate))).otherwise(thr)
    # coalesce: a NULL id (no hash basis) must read as a DROP verdict,
    # not a NULL that silently vanishes from keep-filters
    return docs.withColumn("keep", F.coalesce(u < thr, F.lit(False)))
