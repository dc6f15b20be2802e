"""Stage 4 — cheap-filter-then-exact-verify (maps F2/F3 lower-bound
pruning, src/divGraph.h:544,1118, and the exact re-rank P8/P10,
src/basis.h:186-202 + src/distances_simd_avx512.cpp:416-420).

Predicate ordering is explicit because Catalyst will not reorder
filters across a Python UDF boundary: the JVM-side MinHash
signature-agreement estimate (zip_with/aggregate) and SimHash Hamming
run FIRST and discard most candidates; only survivors pay the text
join + exact-Jaccard pandas UDF."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.functions.hashing import signature_agreement, simhash_hamming
from lsh_apg_spark.functions.minhash import make_jaccard_udf


def prefilter_pairs(pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig,
                    id_col: str = "url") -> DataFrame:
    """(a, b) -> (a, b, sig_est, hamming) for pairs passing the cheap
    signature filter. Two shuffle joins against the (slim) signatures
    table; the estimate itself is whole-stage-codegen JVM work."""
    sig_a = signatures.select(
        F.col(id_col).alias("a"),
        F.col("minhash").alias("_mh_a"),
        F.col("simhash").alias("_sh_a"),
    )
    sig_b = signatures.select(
        F.col(id_col).alias("b"),
        F.col("minhash").alias("_mh_b"),
        F.col("simhash").alias("_sh_b"),
    )
    threshold = max(0.0, cfg.tau - cfg.prefilter_margin)
    return (
        pairs.join(sig_a, "a").join(sig_b, "b")
        .withColumn("sig_est", signature_agreement("_mh_a", "_mh_b"))
        .withColumn("hamming", simhash_hamming("_sh_a", "_sh_b"))
        .filter((F.col("sig_est") >= threshold)
                | (F.col("hamming") <= cfg.hamming_max))
        .select("a", "b", "sig_est", "hamming")
    )


def verify_edges(filtered: DataFrame, docs: DataFrame, cfg: DedupConfig,
                 id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(a, b, ...) -> verified edges (a, b, jaccard, hamming) with
    exact word-shingle Jaccard >= tau (the reference computes exact
    distance on every surviving candidate, src/e2lsh.cpp:170 — so do
    we; the MinHash estimate never decides an edge)."""
    texts_a = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    texts_b = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    jaccard = make_jaccard_udf(cfg)
    return (
        filtered.join(texts_a, "a").join(texts_b, "b")
        .withColumn("jaccard", jaccard(F.col("_ta"), F.col("_tb")))
        .filter(F.col("jaccard") >= cfg.tau)
        .select("a", "b", "jaccard", "hamming")
    )
