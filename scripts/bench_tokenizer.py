"""Microbenchmark: per-doc dict-memo tokenizer vs the Arrow-tokenized
batch kernel (VERDICT r4 item 4) on fixture web text — the signature
stage's #1 CPU consumer. Single-threaded, pure kernel cost (no Spark),
min-of-N so hypervisor steal bursts don't decide the verdict.

Usage: python scripts/bench_tokenizer.py [n_docs] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from lsh_apg_spark.fixtures import generate_pages  # noqa: E402
from lsh_apg_spark.functions import kernels  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k = 5
    texts = list(generate_pages(n_docs=n_docs, seed=42).pages["text"])
    # Arrow batches in the UDF are ~10k rows; measure at batch size
    print(f"n_docs={n_docs} k={k} reps={reps} (min-of-reps)")

    def run_perdoc():
        cache: dict = {}
        return [kernels.shingle_hashes(t or "", k, cache) for t in texts]

    def run_arrow():
        cache: dict = {}
        return kernels.shingle_hashes_arrow_batch(texts, k, cache)

    # parity first — a fast wrong kernel is not a result
    ref, got = run_perdoc(), run_arrow()
    assert all(np.array_equal(a, b) for a, b in zip(ref, got)), "PARITY FAIL"

    walls = {"perdoc": [], "arrow": []}
    for _ in range(reps):
        for name, fn in (("perdoc", run_perdoc), ("arrow", run_arrow)):
            t0 = time.monotonic()
            fn()
            walls[name].append(time.monotonic() - t0)
    p, a = min(walls["perdoc"]), min(walls["arrow"])
    print(f"perdoc  min {p:.3f}s  all {[round(x, 3) for x in walls['perdoc']]}")
    print(f"arrow   min {a:.3f}s  all {[round(x, 3) for x in walls['arrow']]}")
    print(f"speedup {p / a:.2f}x")


if __name__ == "__main__":
    main()
