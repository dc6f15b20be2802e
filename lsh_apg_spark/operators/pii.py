"""PII scrubbing — redact e-mail addresses and phone-like numbers
from document text, counting what was removed.

A standard pre-release pass in web-text curation (C4 strips lines with
"lorem ipsum"/code; CCNet-style pipelines strip contact PII before
training). The reference has no text stage at all (its unit is the
vector); this operator serves the engine's web-corpus target the same
way the quality/boilerplate passes do.

Scale shape: a pure per-row chain of JVM regexp expressions — zero
shuffles, zero Python, whole-stage codegen. At 10^12 documents this is
a narrow map over the scan, and the counts aggregate with map-side
combine if rolled up.

Regex portability is a design constraint (the oracle replays the SAME
match set in DuckDB/RE2): ASCII classes, no backreferences. The one
place the two engines' shared subset runs out is the word boundary:
Java's \b is Unicode-aware (a digit after 'ё' has NO \b in Java but
DOES in RE2's ASCII \b — measured divergence, caught by the
cross-engine fuzz), so the FROZEN semantic is RE2's ASCII boundary
and the Spark side expresses it with explicit ASCII lookarounds
(Java supports lookaround, RE2 does not — each engine gets the
spelling it can run; the fuzz fence proves the match sets equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Frozen patterns (part of the curation config, like TRACKING_PARAMS):
# ASCII-only, backreference-free. EMAIL_RE is engine-identical.
# PHONE_RE's boundary has two spellings of ONE match set: the RE2/
# oracle form uses \b (ASCII there), the Java/Spark form replaces
# each \b with the equivalent explicit ASCII lookaround — because the
# pattern's edges are digits, \b-before ⟺ (?<![0-9A-Za-z_]) and
# \b-after ⟺ (?![0-9A-Za-z_]) exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{4}\b"                  # RE2 / oracle form
PHONE_RE_JAVA = (r"(?<![0-9A-Za-z_])"              # Spark / Java form
                 r"\d{3}[-. ]\d{4}(?![0-9A-Za-z_])")


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, text, ...) -> (id, n_emails, n_phones, clean_text).

    E-mails are counted and redacted first, phones counted and
    redacted on the e-mail-redacted text (an e-mail's local part can
    contain a phone-shaped token; staging the passes makes the count
    semantics order-defined and identical in the SQL oracle). The
    replacement tokens contain no digits or ``@`` so the passes cannot
    feed each other.
    """
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(no_email, PHONE_RE_JAVA, "<PHONE>")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(no_email, F.lit(PHONE_RE_JAVA)).alias("n_phones"),
        clean.alias("clean_text"),
    )
