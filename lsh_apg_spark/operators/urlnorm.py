"""URL canonicalization + canonical-URL dedup — the crawl-side dedup
stage that precedes every content-level pass in a web-text pipeline
(the same page is crawled as http/https, with/without www, with
tracking params, fragments, default ports, trailing slashes; CCNet /
C4 collapse these before ever hashing text).

The reference has no URL stage (its unit is the vector); this operator
serves the engine's web-corpus target (BASELINE.json input_hint: pages
keyed by ``url``). It pairs with the pipeline's (url, cluster_id)
output: canonical-URL dedup collapses recrawls of one page, content
dedup then collapses distinct pages with duplicate text.

Scale shape: canonicalization is a pure per-row chain of JVM regexp
expressions (zero shuffles, zero Python); dedup is one groupBy on the
canonical string with a map-side-combined min — a recrawl family of
10^6 variants of one URL ships one partial row per task. Every regex
is portable between Java (Spark) and RE2 (DuckDB) so the operator is
oracle-verifiable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (frozen; part
# of the dedup config like shingle size — extend only with a re-freeze)
TRACKING_PARAMS = "utm_[a-z]+|fbclid|gclid|ref"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, as a pure column
    expression. Rules (each a single portable regex step):

    1. scheme and host lowercase; ``www.`` prefix dropped
    2. explicit default ports ``:80`` / ``:443`` dropped
    3. fragment (``#...``) dropped
    4. tracking query params (TRACKING_PARAMS) dropped — three
       constant-replacement steps (``&p=v`` anywhere, ``?p=v&`` at the
       query head, ``?p=v`` alone) so no regex BACKREFERENCE is needed:
       replacement syntax is the one regex feature Java (Spark) and
       RE2 (DuckDB) disagree on, and oracle portability is a design
       constraint here
    5. trailing separators dropped (bare ``?``/``&`` tails, trailing
       slashes): ``.../path/`` == ``.../path`` and a bare host is
       represented without ``/``

    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)
    (property-tested). Non-URL input degrades gracefully (no scheme
    match -> value passes through unchanged).
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^(www\.)+", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    tp = TRACKING_PARAMS
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")                      # fragment
    rest = F.regexp_replace(rest, r"&(" + tp + r")=[^&#]*", "")     # &p=v
    rest = F.regexp_replace(rest, r"\?(" + tp + r")=[^&#]*&", "?")  # ?p=v&q -> ?q
    rest = F.regexp_replace(rest, r"\?(" + tp + r")=[^&#]*$", "")   # ?p=v alone
    rest = F.regexp_replace(rest, r"[?&]+$", "")                    # bare tails
    rest = F.regexp_replace(rest, r"/+$", "")                       # trailing /
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest))


def url_dedup(pages: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep-first dedup by canonical URL: every row gains
    ``canonical_url`` and ``keep`` (true iff the row has the smallest
    ``id_col`` among rows sharing a canonical form — the deterministic
    keep-first rule the exact-dedup operator uses).

    One shuffle total: groupBy(canonical) -> min(id), map-side
    combined, joined back broadcast-eligible only when the winner set
    is small — the join key is the canonical string itself, so
    Catalyst shuffles both sides on it without a second exchange of
    the pages frame beyond the aggregate's.
    """
    canon = pages.withColumn("canonical_url", canonicalize_url(url_col))
    winners = (
        canon.groupBy("canonical_url")
        .agg(F.min(id_col).alias("_keep_id"))
    )
    return (
        canon.join(winners, "canonical_url")
        .withColumn("keep", F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )
