"""Text normalization — the curation pipeline's first pass.

Every web-text pipeline normalizes before it measures (CCNet §3.1
lowercase/accent-folds for its paragraph hashes; C4 strips boilerplate
lines): mixed Unicode composition forms make byte-level dedup miss
visually identical pages, and stray control bytes poison downstream
tokenizers. The reference engine (float-vector ANN) has no analogue.

Two stages, in fixed order:

1. **NFC composition** — a pandas UDF over ``unicodedata`` with an
   ``is_normalized`` fast path (already-NFC strings, the overwhelming
   web majority, take a C-level check and no allocation). Python here
   is measured-necessary, not laziness: Spark has no JVM NFC
   expression, and this container's pyarrow 16.1 ``utf8_normalize``
   does NOT compose (form='NFC' leaves U+0065 U+0301 decomposed —
   verified against both CPython's unicodedata and DuckDB's
   nfc_normalize, which agree with each other; the Arrow path would
   diverge from every oracle). Map-only, Arrow-batched, no shuffle.

2. **JVM regexp cleanup** — CRLF→LF, control-byte strip (TAB/LF
   survive), trailing intra-line whitespace, 3+ blank lines collapsed
   to one blank line, leading/trailing whitespace. Every pattern is
   RE2-portable (no lookaround, no backrefs) so the DuckDB oracle
   runs the identical chain with the 'g' flag; whole-stage codegen,
   zero shuffles.

At 100 TB this is a pure narrow map over the scan — it pipelines into
whatever consumes it (signatures, quality, packing) without a stage
boundary.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# (pattern, replacement) rule tables, applied in order; identical
# across Spark's Java regex and DuckDB's RE2 (oracle adds the 'g'
# flag). Portability is why the trim rules avoid both `\s` (Java's
# includes \x0b, RE2's does not) and `$` (Java's matches BEFORE a
# final U+2028/U+2029/U+0085 line terminator, RE2's does not -
# measured divergence): explicit ASCII classes + the absolute-end
# `\z`, which both engines share.
#
# Control bytes are stripped BEFORE NFC (a separate table) for two
# reasons: junk bytes must not block composition ('e' + BEL + U+0301
# composes only if the BEL goes first - combining marks attach to
# adjacent bases), and DuckDB's nfc_normalize truncates at an
# embedded NUL whenever the string takes the non-ASCII utf8proc path
# (measured: pure-ASCII NUL strings survive, NUL + any non-ASCII
# char truncates) - the oracle needs a NUL-free NFC input, so the
# engine defines the same order.
PRE_NFC_RULES: tuple[tuple[str, str], ...] = (
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),     # control bytes
)
CLEANUP_RULES: tuple[tuple[str, str], ...] = (
    (r"\r\n?", "\n"),                              # CRLF / bare CR
    (r"[ \t]+\n", "\n"),                           # trailing line ws
    (r"\n{3,}", "\n\n"),                           # blank-line runs
    (r"^[ \t\n\f\r]+", ""),                       # leading ws
    (r"[ \t\n\f\r]+\z", ""),                     # trailing ws
)


@F.pandas_udf(StringType())
def _nfc_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(
            lambda t: t if t is None or unicodedata.is_normalized("NFC", t)
            else unicodedata.normalize("NFC", t))


def normalize_text(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """docs -> (id_col, text, changed): NFC-composed, control-stripped,
    whitespace-disciplined text plus a per-row changed flag (cleaned
    != original — lets callers semi-join just the rewritten minority
    when persisting incrementally). NULL text passes through NULL with
    changed=false."""
    cleaned = F.col(text_col)
    for pat, repl in PRE_NFC_RULES:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    cleaned = _nfc_udf(cleaned)
    for pat, repl in CLEANUP_RULES:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return docs.select(
        F.col(id_col),
        cleaned.alias("text"),
        (~(cleaned.eqNullSafe(F.col(text_col)))).alias("changed"),
    )
