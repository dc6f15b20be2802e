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
    expression. The URL is decomposed into scheme / host / path /
    query (fragment discarded) and each component is normalized
    independently — rules never leak across component boundaries (a
    trailing slash inside a query VALUE is data; a trailing slash on
    the path is not):

    1. scheme and host lowercase; ``www.`` prefix dropped
    2. the scheme's OWN default port dropped (``:80`` for http,
       ``:443`` for https — https://host:80 is a different endpoint
       and stays distinct)
    3. fragment (``#...``) dropped
    4. tracking params (TRACKING_PARAMS) dropped from the query —
       three constant-replacement steps (``&p=v`` anywhere, ``p=v&``
       at the head, ``p=v`` alone) so no regex BACKREFERENCE is
       needed: replacement syntax is the one regex feature Java
       (Spark) and RE2 (DuckDB) disagree on, and oracle portability is
       a design constraint. Only the first step can match more than
       once, so Spark's replace-all and an explicitly-'g'-flagged
       DuckDB call see identical match sets; a literal ``?`` inside a
       query value is data and survives untouched
    5. surviving query params sorted lexicographically (``?a=1&b=2``
       and ``?b=2&a=1`` are the same page on most sites) — a plain
       split/sort/join on ``&``, binary string order in both engines;
       a site whose handler is order-SENSITIVE merges distinct pages,
       the same acceptable-collapse trade rule 4 already makes
    6. trailing slashes collapsed ON THE PATH (``.../path/`` ==
       ``.../path``, bare host without ``/``); the query is
       re-appended only when non-empty

    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)
    (property-tested). NULL input yields NULL; input with no
    ``scheme://`` passes through unchanged.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^(www\.)+", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
            .otherwise(host))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")                      # fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")                       # trailing /
    tp = TRACKING_PARAMS
    q = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)  # after the FIRST ?
    q = F.regexp_replace(q, r"&(" + tp + r")=[^&]*", "")            # &p=v
    q = F.regexp_replace(q, r"^(" + tp + r")=[^&]*&", "")           # p=v&x -> x
    q = F.regexp_replace(q, r"^(" + tp + r")=[^&]*$", "")           # p=v alone
    q = F.array_join(F.array_sort(F.split(q, "&")), "&")            # param sort
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path,
                 F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))))


def url_dedup(pages: DataFrame, url_col: str = "url",
              id_col: str = "doc_id", keep: str = "first",
              ts_col: str = "warc_ts") -> DataFrame:
    """Dedup by canonical URL: every row gains ``canonical_url`` and
    ``keep`` (true for exactly one row per canonical form). Two
    deterministic policies:

    * ``keep="first"`` — smallest ``id_col`` wins (the keep-first rule
      the exact-dedup operator uses);
    * ``keep="latest"`` — the newest ``ts_col`` snapshot wins (what a
      recrawling pipeline wants: serve the freshest capture), ties
      broken by smallest ``id_col``; NULL timestamps lose to any
      non-NULL one.

    Rows with a NULL url have no dedup basis: they pass through with
    ``keep`` = true and a NULL canonical (two unknown addresses are
    not duplicates of each other — an equi-join formulation would
    silently DROP them).

    One shuffle total on the non-null side: groupBy(canonical) -> a
    map-side-combined min/max, joined back on the canonical string, so
    Catalyst shuffles both sides on it without a second exchange of
    the pages frame beyond the aggregate's.
    """
    canon = pages.withColumn("canonical_url", canonicalize_url(url_col))
    with_url = canon.filter(F.col("canonical_url").isNotNull())
    null_url = canon.filter(F.col("canonical_url").isNull()) \
        .withColumn("keep", F.lit(True))
    if keep == "first":
        winners = (
            with_url.groupBy("canonical_url")
            .agg(F.min(id_col).alias("_keep_id"))
        )
    elif keep == "latest":
        # min over (-unix_micros(ts), id): struct ordering is
        # lexicographic, so newest ts wins and min id breaks ties.
        # The negation lives on the TIMESTAMP (cast to micros), never
        # on the id, so the policy is id-type-agnostic — the engine's
        # natural page key is a STRING url and numeric negation of it
        # would throw under ANSI mode. A NULL ts coalesces to the
        # epoch floor so mixed groups prefer any real timestamp and
        # all-NULL groups still pick min id.
        ts = F.coalesce(F.col(ts_col),
                        F.to_timestamp(F.lit("1970-01-01")))
        winners = (
            with_url.groupBy("canonical_url")
            .agg(F.min(F.struct((-F.unix_micros(ts)).alias("_nts"),
                                F.col(id_col).alias("_id"))).alias("_w"))
            .select("canonical_url", F.col("_w._id").alias("_keep_id"))
        )
    else:
        raise ValueError(f"unknown keep policy: {keep!r}")
    return (
        with_url.join(winners, "canonical_url")
        .withColumn("keep", F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
        .unionByName(null_url)
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl profile over canonical URLs: (host, n_pages,
    n_unique_pages, dup_ratio) — the crawl-ops view that drives
    per-domain recrawl budgets and domain-level quality decisions
    (a host whose dup_ratio ~ 1 is being recrawled for nothing).

    NULL urls carry no host and are profiled under host = '' rather
    than dropped, and each counts as UNIQUE (two unknown addresses are
    not duplicates of each other — the same stance url_dedup takes;
    a bare count(DISTINCT) would ignore the NULLs and report unknown
    addresses as 100% duplicate).

    Scale shape: ``count(DISTINCT canonical_url)`` looks like a skew
    trap (one mega-host holds most of a web corpus), but Catalyst
    plans it as two exchanges keyed (host, canonical_url) THEN (host)
    with partial aggregation at both — the mega-host's distinct set is
    spread across partitions in stage one and arrives pre-counted, so
    no single task ever holds a whole domain.
    """
    c = canonicalize_url(url_col)
    host = F.coalesce(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        F.lit(""))
    return (
        pages.select(host.alias("host"), c.alias("_cu"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"),
             (F.countDistinct("_cu")
              + F.count(F.when(F.col("_cu").isNull(), 1))
              ).alias("n_unique_pages"))
        .withColumn(
            "dup_ratio",
            F.round(1 - F.col("n_unique_pages") / F.col("n_pages"), 4))
    )


def domain_sample(pages: DataFrame, quota: int, url_col: str = "url",
                  id_col: str = "doc_id", n_salts: int = 32) -> DataFrame:
    """Per-domain quota sampling: keep at most ``quota`` pages per
    canonical host, chosen deterministically — rows ranked by
    (md5(canonical_url), id) within their host, rank <= quota kept.
    The standard web-corpus re-balancing step (C4 / RefinedWeb cap
    mega-domains so one forum or link farm cannot dominate the corpus);
    md5 order makes the sample a uniform, engine-reproducible draw
    rather than a crawl-order artifact. Returns ONLY the kept rows as
    (id, host, rank); rows with a NULL/hostless url have no quota basis
    and all pass through with host = '' and a NULL rank (the url_dedup
    stance: unknown addresses are not interchangeable with each other).

    Scale shape — the naive form (one row_number window per host) puts
    an entire mega-host in one task: a host holding 1% of a 10^12-page
    corpus is a 10^10-row sort on one core. Instead, a two-level
    rank-and-prune: rows are first ranked within (host, salt) buckets
    — ``n_salts``-way deterministic split, so the biggest task shrinks
    n_salts-fold and further salting is a knob — and only bucket ranks
    <= quota survive to the exact global rank. The global top-quota of
    a host is necessarily in the top-quota of its bucket, so the prune
    is lossless; the second window sees <= n_salts * quota rows per
    host regardless of corpus size. Single pass: the source is scanned
    ONCE and the canonicalization chain evaluated once per row —
    hostless rows ride the same windows under a per-row sentinel key
    (each alone in its partition, rank always 1), instead of a second
    filter branch re-scanning the source. Pure JVM end-to-end.
    """
    from pyspark.sql import Window

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    c = canonicalize_url(url_col)
    host = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rows = pages.select(
        F.col(id_col), host.alias("host"), F.md5(c).alias("_m"))
    hostless = F.col("host").isNull() | (F.col("host") == "")
    # sentinel partition key: "\x00" + id is unique per hostless row
    # and cannot collide with a real host (hosts never contain NUL),
    # so every hostless row ranks 1 in both windows and survives the
    # quota filters without a second scan of the source. A NULL id
    # would make the concat NULL and pool every NULL-id hostless row
    # into ONE window partition (quota would then drop some, breaking
    # the all-pass-through contract) — fall back to a per-row unique
    # id so each still stands alone.
    key = F.when(hostless,
                 F.concat(F.lit("\x00"),
                          F.coalesce(
                              F.col(id_col).cast("string"),
                              F.concat(F.lit("\x00"),
                                       F.monotonically_increasing_id()
                                       .cast("string"))))) \
        .otherwise(F.col("host"))
    keyed = rows.select(
        F.col(id_col), "host", "_m", hostless.alias("_hl"),
        key.alias("_key"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("_salt"))
    w_bucket = Window.partitionBy("_key", "_salt") \
        .orderBy(F.col("_m"), F.col(id_col))
    w_key = Window.partitionBy("_key").orderBy(F.col("_m"), F.col(id_col))
    return (
        keyed.withColumn("_br", F.row_number().over(w_bucket))
        .filter(F.col("_br") <= quota)
        .withColumn("_r", F.row_number().over(w_key))
        .filter(F.col("_r") <= quota)
        .select(
            id_col,
            F.when(F.col("_hl"), F.lit("")).otherwise(F.col("host"))
            .alias("host"),
            F.when(F.col("_hl"), F.lit(None).cast("int"))
            .otherwise(F.col("_r")).alias("rank"))
    )
