"""lsh_apg_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch reinterpretation of the LSH-APG reference
(Jacyhust/LSH-APG, PVLDB 2023) for web-scale text dedup:

  pages ─► signatures (MinHash + SimHash, Arrow-batched pandas UDFs)
        ─► buckets    (LSH banding + APG-style multi-probe, JVM-side xxhash64)
        ─► pairs      (within-bucket candidate pairs, hot-bucket caps)
        ─► edges      (exact Jaccard verify — pure JVM array_intersect)
        ─► clusters   (iterative hash-partitioned connected components)

Everything is DataFrame/SQL-first: Catalyst plans the shuffles, pandas
UDFs carry only the kernels Spark genuinely lacks (MinHash/shingle
hashing, winnowing fingerprints); the per-pair verify path has no
Python at all.
"""

from lsh_apg_spark.config import DedupConfig
from lsh_apg_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
