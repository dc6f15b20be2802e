"""Offline sweep for the recall >= 0.99 graph operating point
(VERDICT r4 item 2) — numpy replica of the Spark operators (same
semantics as scripts/tune_ann.py) on the CLUSTERED corpus the bench's
ann_eval_clustered row uses (bench.make_clustered_corpus: 20k vecs,
dim 64, 10 members/center, noise 0.15, seed 7), where the reference's
committed row lives (dataset/ANN/LSH-G_div_result.csv:2 = recall
0.9942 / cost 0.0264, ef=k+150 sweep src/main.cpp:158-174).

Sweeps (build knobs, T, seed knobs, ef, rounds, margin) and prints the
recall/cost frontier; also prints the LSH frontier so "cost < best LSH
at equal recall" is checkable from one output.

Usage: python scripts/tune_ann_frontier.py [n_vecs] [n_queries]
"""
from __future__ import annotations

import sys

import numpy as np

from tune_ann import (build_graph, eval_lsh, exact_topk, graph_search,
                      lsh_candidates, make_sketch)


def make_clustered(n_vecs=20_000, dim=64, members=10, noise=0.15, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    n_centers = n_vecs // members
    centers = rng.standard_normal((n_centers, dim))
    V = np.repeat(centers, members, axis=0) \
        + noise * rng.standard_normal((n_centers * members, dim))
    # NOTE: member noise draw order differs from bench.make_clustered_corpus
    # (which interleaves center/noise per row) — same distribution, so the
    # frontier transfers; the chosen point is re-verified on the REAL
    # Spark operators + bench corpus before being committed.
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    return V


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = 10
    V = make_clustered(n_vecs)
    qidx = np.arange(n_q)
    exact = exact_topk(V, qidx, k)
    print(f"N={len(V)} dim={V.shape[1]} Q={n_q} k={k}")

    print("\n-- LSH frontier (bands, r, probes) -> recall, cost")
    for bands, r, probes in [(16, 8, 2), (24, 8, 2), (32, 8, 2),
                             (48, 8, 2), (32, 8, 3), (24, 6, 2),
                             (32, 6, 2), (48, 6, 1), (64, 8, 2)]:
        rec, cost = eval_lsh(V, qidx, exact, k, bands, r, probes)
        print(f"  L={bands} r={r} p={probes}: recall={rec:.4f} "
              f"cost={cost:.4f}")

    sketch = make_sketch(V)
    print("\n-- graph frontier")
    for bL, br, bp, T in [(8, 4, 2, 16), (8, 4, 2, 24), (8, 4, 2, 32),
                          (12, 4, 2, 24)]:
        edges = build_graph(V, T, bL, br, bp)
        for sL, sr, sp in [(8, 8, 1), (12, 8, 1)]:
            seeds = lsh_candidates(V, qidx, sL, sr, sp)
            for ef, rounds in [(64, 4), (128, 4), (160, 6), (256, 6)]:
                for margin, sk in [(0.15, sketch), (0.3, sketch),
                                   (None, None)]:
                    rec, cost, pruned = graph_search(
                        V, edges, qidx, exact, k, ef, rounds, seeds,
                        sketch=sk, margin=margin or 0)
                    print(f"  build L{bL}r{br}p{bp} T{T} | seed "
                          f"L{sL}r{sr}p{sp} | ef{ef} R{rounds} "
                          f"m={margin}: recall={rec:.4f} "
                          f"cost={cost:.4f} pruned={pruned}")


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    main()
