"""Substring-containment pass — winnowing fingerprints + exact LCS
verify. New capability demanded by the north_star (no reference
analogue; the closest relative is the reference's two-phase
candidates-then-exact-verify shape, src/e2lsh.cpp:131-200 + :170).

A global distributed suffix array would need a total sort of all
suffixes; winnowing (Schleimer et al., SIGMOD'03) gets the same
guarantee — any shared span >= min_substring_len yields a shared
fingerprint — with an embarrassingly parallel per-document pass, which
is the right trade at 10^12 documents. The fingerprint buckets then
reuse the SAME capped/salted pair machinery as the MinHash bands."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.functions.minhash import make_lcs_udf, make_winnow_udf
from lsh_apg_spark.operators.pairs import candidate_pairs


def winnow_buckets(docs: DataFrame, cfg: DedupConfig,
                   id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, bhash=fingerprint) — shaped like MinHash
    bucket rows so pair generation is shared."""
    winnow = make_winnow_udf(cfg)
    return docs.select(
        id_col, F.explode(winnow(F.col(text_col))).alias("bhash"))


def substring_edges(docs: DataFrame, cfg: DedupConfig,
                    id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, text, ...) -> (a, b, lcs_len) with exact longest common
    substring >= min_substring_len, candidates from winnowing."""
    buckets = winnow_buckets(docs, cfg, id_col, text_col)
    cands = candidate_pairs(buckets, cfg, id_col)
    texts_a = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    texts_b = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    lcs = make_lcs_udf()
    return (
        cands.join(texts_a, "a").join(texts_b, "b")
        .withColumn("lcs_len", lcs(F.col("_ta"), F.col("_tb")))
        .filter(F.col("lcs_len") >= cfg.min_substring_len)
        .select("a", "b", "lcs_len")
    )
