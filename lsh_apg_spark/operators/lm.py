"""Corpus-trained unigram language-model quality scoring — the
CCNet-style "perplexity bucket" pass (Wenzek et al. 2020 §3.2: score
every page with a LM, split the corpus into head/middle/tail quality
buckets). CCNet uses a 5-gram KenLM; the operator contract here is
the distributed shape — train a model ON the corpus, broadcast it,
score every document, bucket by score quantiles — with a unigram
add-one-smoothed LM as the deterministic, oracle-verifiable instance
(no external model files, per the no-external-data constraint).

The reference has no text stage; this serves the engine's web-corpus
target like the other curation passes.

Scale shape:
* training = one explode + token-keyed groupBy with map-side combine
  (hot tokens like "the" pre-aggregate per task — count skew never
  concentrates rows);
* the model is vocabulary-sized (Heaps' law: ~10^7-10^8 tokens for a
  web corpus — megabytes to low gigabytes), broadcast when under
  ``broadcast_vocab_limit``, else the score join degrades to a
  shuffle equi-join where AQE skew-split handles the hot tokens
  (the same broadcast-safety rail as decontaminate);
* scoring = per-doc agg of the joined log-probs, map-side combined;
* bucketing computes two exact percentile cutoffs (one tiny agg) and
  broadcasts them — never a global sort/ntile over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_apg_spark.operators.textstats import tokens_col


def train_unigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(docs) -> LM table (token, logp, oov_logp) with add-one
    smoothing over the corpus vocabulary: logp = ln((c+1)/(T+V)),
    oov_logp = ln(1/(T+V)) carried as a constant column so the score
    join needs no second input."""
    toks = docs.select(F.explode(tokens_col(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    norm = counts.agg(
        F.sum("c").alias("_t"), F.count(F.lit(1)).alias("_v"))
    return (
        counts.crossJoin(F.broadcast(norm))
        .select(
            "token",
            F.log((F.col("c") + 1) / (F.col("_t") + F.col("_v")))
             .alias("logp"),
            F.log(1 / (F.col("_t") + F.col("_v"))).alias("oov_logp"),
        )
    )


def lm_score(docs: DataFrame, lm: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             broadcast_vocab_limit: int = 20_000_000) -> DataFrame:
    """(docs, lm) -> (id, n_tokens, avg_logp): mean token log-prob per
    document (the perplexity proxy; higher = more fluent under the
    corpus LM). OOV tokens score the smoothing floor. avg_logp is
    rounded to 4dp — bucketing cuts on it, and the rounding makes the
    cutoff comparisons exact across engines/summation orders."""
    # the broadcast gate needs a measured row count; localCheckpoint
    # (eager) materializes the training aggregation ONCE so the count
    # and the score join reuse it — and unlike persist(), the blocks
    # are released by the context cleaner when this DataFrame goes out
    # of scope, so repeated lm_score calls in one session don't
    # accumulate cached partitions for the process lifetime
    lm = lm.localCheckpoint(eager=True)
    vocab = lm.count()
    lm_side = F.broadcast(lm) if vocab <= broadcast_vocab_limit else lm
    toks = docs.select(F.col(id_col), F.explode(tokens_col(text_col))
                       .alias("token"))
    oov = lm.select("oov_logp").limit(1)
    return (
        toks.join(lm_side, "token", "left")
        .crossJoin(F.broadcast(oov).withColumnRenamed("oov_logp", "_floor"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.avg(F.coalesce(F.col("logp"), F.col("_floor"))), 4)
              .alias("avg_logp"))
    )


def lm_quality_buckets(scored: DataFrame, head_frac: float = 1 / 3,
                       tail_frac: float = 1 / 3) -> DataFrame:
    """CCNet §3.2 bucketing: 'head' = the top ``head_frac`` of docs by
    avg_logp, 'tail' = the bottom ``tail_frac``, 'middle' between.
    Cutoffs are exact interpolated percentiles of avg_logp (already
    4dp-rounded by lm_score), broadcast as a 1-row frame."""
    cuts = scored.agg(
        F.percentile("avg_logp", 1 - head_frac).alias("_head_cut"),
        F.percentile("avg_logp", tail_frac).alias("_tail_cut"))
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.when(F.col("avg_logp") >= F.col("_head_cut"), "head")
             .when(F.col("avg_logp") <= F.col("_tail_cut"), "tail")
             .otherwise("middle"))
        .drop("_head_cut", "_tail_cut")
    )
