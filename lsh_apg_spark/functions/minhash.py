"""Arrow-batched pandas UDFs around the numpy kernels.

These are the only Python-side map operators in the hot path; each call
processes one Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch
rows) with numpy — the Spark analogue of the reference's SIMD kernels
(cppCode/LSH-APG/src/fastL2_ip.h, distances_simd_avx512.cpp)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
)

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.functions import kernels

_SIGNATURE_SCHEMA = StructType([
    StructField("minhash", ArrayType(LongType(), False), False),
    StructField("simhash", LongType(), False),
    StructField("shingles", ArrayType(LongType(), False), False),
    StructField("bhashes", ArrayType(LongType(), False), False),
])


def make_signature_udf(cfg: DedupConfig):
    """(text) -> struct<minhash: array<bigint>, simhash: bigint,
    shingles: array<bigint>, bhashes: array<bigint>>.

    ``shingles`` is the sorted distinct shingle-hash set itself — stored
    so exact-Jaccard verification is a pure JVM array_intersect over the
    pair join (no Python in the verify path; SURVEY.md §2.2 P8/P10).

    ``bhashes`` is the precomputed LSH band+probe bucket-key array
    (bands*(1+num_probes) BIGINTs, kernels.band_probe_keys): computing
    it here costs ~ms per Arrow batch (one vectorized fold over the
    batch's minhash matrix) whereas the JVM expression form under the
    bucket explode measured ~6 s per 100k docs and did not scale with
    cores — the banding stage downstream is then a bare explode.

    Iterator form so the (a, b) MinHash params are materialized once per
    executor task, not per batch — the Spark analogue of broadcasting
    HashParam (reference src/def.h:24-34, seeded src/e2lsh.cpp:50-57).
    """
    k = cfg.shingle_size
    num_hashes = cfg.num_hashes
    seed = cfg.seed
    bands, rows_per_band = cfg.bands, cfg.rows_per_band
    num_probes = cfg.num_probes

    @F.pandas_udf(_SIGNATURE_SCHEMA)
    def signature_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        a, b = kernels.minhash_params(num_hashes, seed)
        for texts in it:
            # Arrow-tokenized shingle kernel (r5, VERDICT r4 item 4):
            # lower/split/occurrence-dedup in Arrow C, blake2b once per
            # unique token, rolling combine per doc over cache-sized
            # slices — element-identical to the frozen per-doc kernel
            # (non-ASCII docs route through it; parity-tested) and
            # measured 1.3-1.4x on fixture text at 4k-10k batch sizes
            # (scripts/bench_tokenizer.py min-of-reps); the whole
            # signatures STAGE (minhash matmul + simhash + band keys +
            # Arrow ser/de included) measured 7.59 -> 6.20 s = 1.22x
            # at 100k docs / local[4], min-of-3 — short of the 1.5x
            # VERDICT aspiration, but strictly faster at exact parity,
            # so shipped. The fully
            # concatenated numpy batch form stays unshipped: its large
            # temporaries stall this VM (see kernels.py STATUS note).
            cache: dict[str, np.uint64] = {}
            shingle_lists = kernels.shingle_hashes_arrow_batch(
                list(texts), k, cache)
            minhashes = np.empty((len(texts), num_hashes), dtype=np.int64)
            shingle_sets = []
            simhashes = np.empty(len(texts), dtype=np.int64)
            for i, sh in enumerate(shingle_lists):
                minhashes[i] = kernels.minhash_signature(sh, a, b)
                simhashes[i] = kernels.simhash64(sh)
                shingle_sets.append(sh.view(np.int64))
            bkeys = kernels.band_probe_keys(
                minhashes, bands, rows_per_band, num_probes)
            yield pd.DataFrame({"minhash": list(minhashes),
                                "simhash": simhashes,
                                "shingles": shingle_sets,
                                "bhashes": list(bkeys)})

    return signature_udf


def make_jaccard_udf(cfg: DedupConfig):
    """(text_a, text_b) -> double exact word-shingle Jaccard.

    NOT the shipped verify path — kept as variant C of the verify
    payload A/B (scripts/ab_verify.py). Measured at 400k docs /
    local[16] (530k candidate pairs): recomputing shingles per pair
    from text is 2.0x SLOWER (15.5s vs 7.7s) than the shipped JVM
    array_intersect over materialized shingle sets, because text rows
    are as wide as shingle-set rows AND the kernel re-pays
    tokenize+hash per pair in Python. The bottom-k sketch variant (B)
    saved only 16% while mis-deciding ~1.1% of edges at the tau
    boundary — unacceptable against the exact-oracle correctness gate.
    Decision recorded in BASELINE.md."""
    k = cfg.shingle_size

    @F.pandas_udf(DoubleType())
    def jaccard_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for text_a, text_b in it:
            cache: dict[str, np.uint64] = {}
            out = np.empty(len(text_a), dtype=np.float64)
            for i, (ta, tb) in enumerate(zip(text_a, text_b)):
                out[i] = kernels.exact_jaccard(ta or "", tb or "", k, cache)
            yield pd.Series(out)

    return jaccard_udf


def make_winnow_udf(cfg: DedupConfig):
    """(text) -> array<bigint> winnowing fingerprints (substring pass)."""
    kgram = cfg.winnow_kgram
    window = cfg.winnow_window

    @F.pandas_udf(ArrayType(LongType(), False))
    def winnow_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series([
                kernels.winnow_fingerprints(t or "", kgram, window).view(np.int64)
                for t in texts
            ])

    return winnow_udf


def make_lcs_udf():
    """(text_a, text_b) -> bigint longest-common-substring length."""
    @F.pandas_udf(LongType())
    def lcs_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for text_a, text_b in it:
            yield pd.Series([
                kernels.longest_common_substring_len(ta or "", tb or "")
                for ta, tb in zip(text_a, text_b)
            ], dtype=np.int64)

    return lcs_udf
