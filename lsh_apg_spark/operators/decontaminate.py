"""Cross-corpus decontamination — flag training documents that
near-duplicate any document of a (small) held-out/eval reference set.

The standard LLM-pipeline hygiene step: before training on a web
corpus, remove documents whose shingle-set Jaccard with any benchmark
document exceeds tau, so eval scores measure generalization rather
than memorization. This is the bipartite form of the engine's MinHash
near-dup dedup (same signature/banding/verify machinery —
SURVEY.md §2.2 P2-P5, §2.4 J1; the reference's single-corpus
candidate+verify loop recast across two corpora), with the asymmetry
that makes it cheap at 100 TB: the eval side is tiny (thousands of
docs), so its bucket table and shingle sets BROADCAST — the train
corpus is scanned once, never shuffled:

  train ──signatures──► bucket explode ─┐
                                        ├─ broadcast hash join on
  eval ───signatures──► bucket explode ─┘  bucket key (train in place)
                 candidates (train_id, eval_id) — rare, tiny
                                        │
  exact verify: JVM array_intersect Jaccard, eval shingles broadcast,
  train shingles probed in place (candidates broadcast to the corpus)

Recall is the LSH family's (bands x rows_per_band at tau — the same
frozen config the dedup pipeline gates recall >= 0.99 on); every
reported pair carries the EXACT Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.operators.banding import explode_buckets
from lsh_apg_spark.operators.signatures import compute_signatures


def decontaminate_pairs(
    train: DataFrame,
    eval_docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    train_signatures: DataFrame | None = None,
) -> DataFrame:
    """(train_id, eval_id, jaccard) for every cross-corpus pair with
    exact shingle-Jaccard >= cfg.tau.

    Pass ``train_signatures`` (a prior `compute_signatures(train, cfg)`
    frame, e.g. the dedup pipeline's checkpointed signature stage) to
    skip re-signaturing the big side — decontamination then touches the
    train corpus only through two in-place probes."""
    cfg = cfg or DedupConfig()
    sig_t = train_signatures if train_signatures is not None \
        else compute_signatures(train, cfg, id_col=id_col, text_col=text_col)
    sig_e = compute_signatures(eval_docs, cfg, id_col=id_col,
                               text_col=text_col)

    b_t = explode_buckets(sig_t, cfg, id_col=id_col) \
        .withColumnRenamed(id_col, "train_id")
    b_e = explode_buckets(sig_e, cfg, id_col=id_col) \
        .withColumnRenamed(id_col, "eval_id")
    cands = (
        b_t.join(F.broadcast(b_e), "bhash")
        .select("train_id", "eval_id")
        .dropDuplicates(["train_id", "eval_id"])
    )

    # exact verify, both joins corpus-shuffle-free: the candidate set
    # (rare by construction — real corpora are not mostly benchmark
    # text) broadcasts against the train signatures; the eval shingle
    # sets broadcast outright
    sh_t = sig_t.select(F.col(id_col).alias("train_id"),
                        F.col("shingles").alias("_st"))
    sh_e = sig_e.select(F.col(id_col).alias("eval_id"),
                        F.col("shingles").alias("_se"))
    inter = F.size(F.array_intersect("_st", "_se"))
    return (
        sh_t.join(F.broadcast(cands), "train_id")
        .join(F.broadcast(sh_e), "eval_id")
        .withColumn("_i", inter)
        .withColumn(
            "jaccard",
            F.col("_i") / (F.size("_st") + F.size("_se") - F.col("_i")))
        .filter(F.col("jaccard") >= cfg.tau)
        .select("train_id", "eval_id", "jaccard")
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    train_signatures: DataFrame | None = None,
) -> DataFrame:
    """The train corpus with contaminated documents REMOVED (left_anti
    against the flagged ids) — the drop-in cleaning step. Schema =
    train's schema, order-preserving per partition."""
    flagged = decontaminate_pairs(
        train, eval_docs, cfg, id_col=id_col, text_col=text_col,
        train_signatures=train_signatures,
    ).select(F.col("train_id").alias(id_col)).distinct()
    return train.join(F.broadcast(flagged), id_col, "left_anti")
