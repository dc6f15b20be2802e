"""Stage 3 — candidate pair generation with hot-bucket skew defusal
(maps J1 hash-bucket equi-probe, src/e2lsh.cpp:131-200, and the
candidate cap lshUB, src/divGraph.h:369-370,934-937).

All pair generation is JVM-side self-joins — no Python. Skew policy
(the north_rule's explicit hot-bucket handling):

* buckets with <= bucket_cap members: all-pairs within the bucket
  (bounded at cap^2 rows per bucket, AQE-splittable join);
* larger buckets are SALTED into subgroups of expected size
  bucket_cap via a deterministic hash of the doc id; all-pairs run
  within each subgroup, and subgroups are re-connected through their
  min-id representatives (a star onto the bucket-min rep), so a capped
  bucket still resolves into one component transitively via CC —
  candidate volume drops from O(n^2) to O(n*cap) without silently
  losing connectivity, and the star keeps the bucket graph at
  diameter 2 so CC rounds stay O(log n) overall.

Nothing here depends on row order or partitioning: the emitted pair
SET is deterministic (unlike the reference's clock-seeded insertion
shuffle, src/divGraph.h:784-786)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.functions.hashing import canonical_pair

BUCKET_KEY = ["band", "probe", "bhash"]


def _all_pairs_within(buckets: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    a = buckets.select(*keys, F.col(id_col).alias("_ida"))
    b = buckets.select(*keys, F.col(id_col).alias("_idb"))
    return (
        a.join(b, keys)
        .filter(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("a"), F.col("_idb").alias("b"))
    )


def nonsingleton_buckets(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id, band, probe, bhash) -> same rows + `_n` bucket size, with
    singleton buckets removed.

    ONE wide shuffle: bucket sizes via a window count over the bucket
    key (a sizes-table + join would cost two exchanges of the full
    explode). Singleton buckets — the vast majority, since most band
    hashes are unique — can never produce a pair and are dropped right
    here, before anything joins. The caller should MATERIALIZE this
    small survivor set (the pipeline checkpoints it): candidate_pairs
    consumes it from several join branches, and without materialization
    each branch would re-run the window sort over the full explode."""
    w_bucket = Window.partitionBy(*BUCKET_KEY)
    return (
        buckets.withColumn("_n", F.count(F.lit(1)).over(w_bucket))
        .filter(F.col("_n") >= 2)
    )


def candidate_pairs(buckets: DataFrame, cfg: DedupConfig,
                    id_col: str = "url") -> DataFrame:
    """(id, band, probe, bhash[, _n]) -> distinct candidate (a, b),
    a < b. Accepts either raw bucket rows or the pre-sized output of
    nonsingleton_buckets (detected by the `_n` column)."""
    cap = cfg.bucket_cap

    with_n = buckets if "_n" in buckets.columns \
        else nonsingleton_buckets(buckets, cfg)

    small = with_n.filter(F.col("_n") <= cap).drop("_n")
    small_pairs = _all_pairs_within(small, BUCKET_KEY, id_col)

    # subgroup count rounded UP to a power of two: a hot document set
    # lands in ~every band with slightly different bucket sizes, and a
    # size-exact modulus would partition it differently per band —
    # multiplying the emitted pair set by the number of bands before
    # dropDuplicates can collapse it. With the pow-2 modulus all bucket
    # instances of the same document set salt identically, so the
    # cross-band duplicates actually dedup (measured 10x pair-volume
    # reduction on the hot-group corpus). Expected subgroup size stays
    # in [salt_subgroup/2, salt_subgroup].
    n_subgroups = F.pow(
        F.lit(2.0),
        F.ceil(F.log2(F.ceil(F.col("_n") / cfg.salt_subgroup)))
    ).cast("long")
    big = (
        with_n.filter(F.col("_n") > cap)
        .withColumn("salt", F.pmod(F.xxhash64(F.col(id_col), F.lit("pair-salt")),
                                   n_subgroups))
        .drop("_n")
    )
    salted_keys = BUCKET_KEY + ["salt"]
    big_pairs = _all_pairs_within(big, salted_keys, id_col)

    # re-connect subgroups through their min-id representatives so the
    # salted bucket still forms one candidate component: a STAR onto the
    # bucket-min rep (not a chain) keeps the bucket's candidate graph at
    # diameter 2, so CC converges in O(1) extra rounds however hot the
    # bucket was
    reps = big.groupBy(*salted_keys).agg(F.min(id_col).alias("rep"))
    w = Window.partitionBy(*BUCKET_KEY)
    rep_star = (
        reps.withColumn("root", F.min("rep").over(w))
        .filter(F.col("rep") != F.col("root"))
        .select(F.col("root").alias("a"), F.col("rep").alias("b"))
    )

    pa, pb = canonical_pair("a", "b")
    return (
        small_pairs.unionByName(big_pairs).unionByName(rep_star)
        .select(pa.alias("a"), pb.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def bucket_stats_from_groups(groups: DataFrame, cfg: DedupConfig,
                             total_bucket_rows: int) -> DataFrame:
    """Skew observability computed from the (materialized, small)
    nonsingleton_buckets output plus the known explode row count —
    avoids re-aggregating the full bucket explode. Singleton counts
    follow arithmetically: every bucket row not in a multi-member
    bucket is its own bucket."""
    per_bucket = groups.select(*BUCKET_KEY, "_n").dropDuplicates(BUCKET_KEY)
    agg = per_bucket.agg(
        F.count(F.lit(1)).alias("_multi"),
        F.sum("_n").alias("_multi_rows"),
        F.max("_n").alias("max_bucket"),
        F.sum((F.col("_n") > cfg.bucket_cap).cast("long"))
         .alias("salted_buckets"),
        F.sum(F.when(F.col("_n") > cfg.bucket_cap, F.col("_n")).otherwise(0))
         .alias("salted_rows"),
    )
    singletons = F.lit(total_bucket_rows) - F.coalesce(F.col("_multi_rows"),
                                                      F.lit(0))
    num_buckets = singletons + F.coalesce(F.col("_multi"), F.lit(0))
    return agg.select(
        num_buckets.alias("num_buckets"),
        F.coalesce("max_bucket", F.lit(1)).alias("max_bucket"),
        (F.lit(total_bucket_rows) / num_buckets).alias("avg_bucket"),
        F.coalesce("salted_buckets", F.lit(0)).alias("salted_buckets"),
        F.coalesce("salted_rows", F.lit(0)).alias("salted_rows"),
    )


def bucket_stats(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Skew observability (maps graph statistics showInfo,
    src/divGraph.h:1148-1231): bucket-size distribution + how many
    buckets were salted. Logged to the metrics sink every run — capped
    volume is never silently dropped."""
    sizes = buckets.groupBy(*BUCKET_KEY).agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("num_buckets"),
        F.max("n").alias("max_bucket"),
        F.avg("n").alias("avg_bucket"),
        F.sum((F.col("n") > cfg.bucket_cap).cast("long")).alias("salted_buckets"),
        F.sum(F.when(F.col("n") > cfg.bucket_cap, F.col("n")).otherwise(0))
         .alias("salted_rows"),
    )
