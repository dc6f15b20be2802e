"""Offline ANN knob tuner — numpy replica of the Spark operators'
candidate-generation semantics, run against the REAL sf embeddings
parquet, so (bands, rows_per_band, num_probes, T, ef, rounds, margin)
defaults are chosen from measured recall/cost curves instead of guessed
(VERDICT r2 item 4: 'calibrate ANN selectivity to the corpus').

The replica mirrors the operators exactly where it matters:
* lsh_topk: per-band base key + leave-one-out probe keys on BOTH sides,
  candidates = any shared key, cost = |candidates| / (Q * N);
* graph_topk: kNN graph built from LSH candidates (exact-scored,
  symmetrized, top-T), then per-round frontier expansion with top-ef
  state, optional sketch pre-prune vs (ef-th best - margin);
* ivf: hash-seeded init + Lloyd rounds, probe nprobe cells.

Usage: python scripts/tune_ann.py [sf_dir]
"""
from __future__ import annotations

import sys

import duckdb
import numpy as np


def load(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    return ids, V


def exact_topk(V, qidx, k):
    sims = V[qidx] @ V.T
    for i, q in enumerate(qidx):
        sims[i, q] = -2
    return np.argsort(-sims, axis=1)[:, :k]


def band_keys(bits: np.ndarray, bands: int, r: int, probes: int) -> list[set]:
    """Per-row set of (band, probe, tuple-of-bits) keys."""
    n = bits.shape[0]
    out = [set() for _ in range(n)]
    for band in range(bands):
        sl = bits[:, band * r:(band + 1) * r]
        for i in range(n):
            out[i].add((band, 0, sl[i].tobytes()))
        for p in range(1, probes + 1):
            kept = np.concatenate(
                [sl[:, :p - 1], sl[:, p:]], axis=1)
            for i in range(n):
                out[i].add((band, p, kept[i].tobytes()))
    return out


def lsh_candidates(V, qidx, bands, r, probes, seed=42):
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((V.shape[1], bands * r))
    bits = (V @ planes > 0).astype(np.int8)
    # bucket index: key -> corpus members
    from collections import defaultdict
    buckets = defaultdict(list)
    keys = band_keys(bits, bands, r, probes)
    for i, ks in enumerate(keys):
        for kk in ks:
            buckets[kk].append(i)
    cands = []
    for q in qidx:
        c = set()
        for kk in keys[q]:
            c.update(buckets.get(kk, ()))
        c.discard(q)
        cands.append(np.array(sorted(c), dtype=np.int64))
    return cands


def eval_lsh(V, qidx, exact, k, bands, r, probes):
    cands = lsh_candidates(V, qidx, bands, r, probes)
    hit = tot = ncand = 0
    for i, q in enumerate(qidx):
        c = cands[i]
        ncand += len(c)
        scored = c[np.argsort(-(V[q] @ V[c].T))][:k] if len(c) else c
        hit += len(set(scored) & set(exact[i]))
        tot += k
    return hit / tot, ncand / (len(qidx) * len(V))


def build_graph(V, T, bands, r, probes, seed=42):
    """LSH-candidate kNN graph: exact-score LSH pairs, symmetrize, top-T."""
    cands = lsh_candidates(V, np.arange(len(V)), bands, r, probes, seed)
    nbrs = [dict() for _ in range(len(V))]
    for a in range(len(V)):
        for b in cands[a]:
            if b > a:
                s = float(V[a] @ V[b])
                nbrs[a][b] = s
                nbrs[b][a] = s
    edges = []
    for a in range(len(V)):
        top = sorted(nbrs[a].items(), key=lambda kv: (-kv[1], kv[0]))[:T]
        edges.append(np.array([b for b, _ in top], dtype=np.int64))
    return edges


def graph_search(V, edges, qidx, exact, k, ef, rounds, seed_cands,
                 sketch=None, margin=0.15):
    hit = tot = scored_total = pruned_total = 0
    for i, q in enumerate(qidx):
        seeds = seed_cands[i]
        if len(seeds) == 0:
            seeds = np.array([0 if q != 0 else 1])
        visited = set(seeds.tolist())
        scores = {int(b): float(V[q] @ V[b]) for b in seeds}
        scored_total += len(seeds)
        state = sorted(scores.items(), key=lambda kv: -kv[1])[:ef]
        frontier = [b for b, _ in state]
        for _ in range(rounds):
            new = set()
            for u in frontier:
                for vtx in edges[u]:
                    if int(vtx) not in visited and vtx != q:
                        new.add(int(vtx))
            if not new:
                break
            visited |= new
            thr = state[-1][1] - margin if len(state) >= ef else -2.0
            admitted = []
            for b in new:
                if sketch is not None and thr > -1:
                    # sketch-estimated cosine lower-than-threshold -> prune
                    h = bin(sketch[q] ^ sketch[b]).count("1")
                    est = np.cos(np.pi * h / 64)
                    if est < thr:
                        pruned_total += 1
                        continue
                admitted.append(b)
            scored_total += len(admitted)
            for b in admitted:
                scores[b] = float(V[q] @ V[b])
            state = sorted(scores.items(), key=lambda kv: -kv[1])[:ef]
            keep = {b for b, _ in state}
            frontier = [b for b in admitted if b in keep]
        top = [b for b, _ in state[:k]]
        hit += len(set(top) & set(exact[i]))
        tot += k
    return hit / tot, scored_total / (len(qidx) * len(V)), pruned_total


def make_sketch(V, seed=9999):
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((V.shape[1], 64))
    bits = (V @ planes > 0).astype(np.uint64)
    out = np.zeros(len(V), dtype=np.uint64)
    for j in range(64):
        out |= bits[:, j] << np.uint64(j)
    return out


def eval_ivf(V, qidx, exact, k, n_cells, nprobe, iters=2, seed=42):
    # seeded-hash init stand-in: deterministic stride sample
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = V[rng.permutation(len(V))[:n_cells]].copy()
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(V @ cn.T, axis=1)
        for c in range(n_cells):
            m = V[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(V @ cn.T, axis=1)
    hit = tot = ncand = 0
    for i, q in enumerate(qidx):
        cells = np.argsort(-(V[q] @ cn.T))[:nprobe]
        c = np.where(np.isin(assign, cells))[0]
        c = c[c != q]
        ncand += len(c)
        top = c[np.argsort(-(V[q] @ V[c].T))][:k] if len(c) else c
        hit += len(set(top) & set(exact[i]))
        tot += k
    return hit / tot, ncand / (len(qidx) * len(V))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ids, V = load(sf_dir)
    qidx = np.where(ids < 20)[0]
    k = 10
    exact = exact_topk(V, qidx, k)
    print(f"N={len(V)} dim={V.shape[1]} Q={len(qidx)} k={k}")

    print("\n-- lsh_topk (bands, r, probes) -> recall, cost")
    for bands, r, probes in [(8, 4, 2), (8, 6, 2), (12, 6, 2), (16, 6, 2),
                             (16, 8, 2), (24, 8, 2), (32, 8, 2), (16, 8, 3),
                             (12, 8, 3), (8, 8, 3)]:
        rec, cost = eval_lsh(V, qidx, exact, k, bands, r, probes)
        print(f"  L={bands} r={r} p={probes}: recall={rec:.3f} cost={cost:.3f}")

    print("\n-- graph (build L,r,p | T | seeds L,r,p | ef rounds margin)")
    sketch = make_sketch(V)
    for bL, br, bp, T in [(8, 4, 2, 16), (12, 6, 2, 16), (12, 6, 2, 24)]:
        edges = build_graph(V, T, bL, br, bp)
        for sL, sr, sp in [(4, 8, 1), (8, 8, 1), (4, 12, 1)]:
            seeds = lsh_candidates(V, qidx, sL, sr, sp)
            for ef, rounds in [(32, 3), (48, 3), (64, 4)]:
                for margin, sk in [(0.15, sketch), (None, None)]:
                    rec, cost, pruned = graph_search(
                        V, edges, qidx, exact, k, ef, rounds, seeds,
                        sketch=sk, margin=margin or 0)
                    print(f"  build L{bL}r{br}p{bp} T{T} | seed L{sL}r{sr}"
                          f"p{sp} | ef{ef} R{rounds} m={margin}: "
                          f"recall={rec:.3f} cost={cost:.3f} pruned={pruned}")

    print("\n-- ivf (n_cells, nprobe) -> recall, cost")
    for nc, np_ in [(32, 8), (32, 12), (16, 8), (16, 6), (64, 16), (32, 16)]:
        rec, cost = eval_ivf(V, qidx, exact, k, nc, np_)
        print(f"  cells={nc} nprobe={np_}: recall={rec:.3f} cost={cost:.3f}")


if __name__ == "__main__":
    main()
