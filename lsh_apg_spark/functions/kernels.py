"""Pure numpy kernels shared by pandas UDFs, the fixture oracle, and
unit tests. Everything is a deterministic function of (config, bytes) —
the Spark analogue of the reference seeding its projections with
``mt19937 rng(0)`` (cppCode/LSH-APG/src/e2lsh.cpp:50-57).

The per-point signature kernel (minhash_signature) maps the reference's
``hashBase::calHash`` S-function projection (src/e2lsh.cpp:62-69); the
exact-Jaccard kernel maps its exact re-rank distance
(src/basis.h:186-202) and the popcount Jaccard kernel
(src/distances_simd_avx512.cpp:416-420) — SIMD is replaced by numpy
over Arrow batches.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
# odd multipliers for the rolling shingle combiner (splitmix64-ish constants)
_SHINGLE_MULT = U64(0x9E3779B97F4A7C15)
_EMPTY_TOKEN_HASH = U64(0x27D4EB2F165667C5)


def token_hash(token: str) -> np.uint64:
    """Stable 64-bit hash of one token (blake2b truncated). Slow path —
    only used via the memoising cache in tokens_to_hashes."""
    return U64(int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"))


def normalize_tokens(text: str) -> list[str]:
    """Frozen normalization: lowercase + whitespace split. Part of the
    recall-parity config — never change without re-freezing golden data.
    The stored ``text`` column itself is NEVER mutated (byte-identical
    per-url invariant); normalization exists only inside signature
    computation."""
    return text.lower().split()


def tokens_to_hashes(tokens: list[str], cache: dict[str, np.uint64]) -> np.ndarray:
    """Map tokens to uint64 hashes with a batch-level memo cache
    (web text repeats tokens heavily — the cache makes the blake2b cost
    ~once per unique token per Arrow batch)."""
    out = np.empty(len(tokens), dtype=U64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = token_hash(t)
            cache[t] = h
        out[i] = h
    return out


def _roll_shingles(th: np.ndarray, k: int) -> np.ndarray:
    """Token-hash array -> sorted distinct k-shingle hashes (rolling
    combine vectorized across positions: k shifted adds). Fewer than k
    tokens degrade to a single whole-text shingle; zero tokens to the
    empty-token sentinel — every document has a non-empty set."""
    n = len(th)
    if n == 0:
        return np.array([_EMPTY_TOKEN_HASH], dtype=U64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        if n < k:
            s = np.zeros(1, dtype=U64)
            for j in range(n):
                s = s * _SHINGLE_MULT + th[j]
            return s
        m = n - k + 1
        s = np.zeros(m, dtype=U64)
        for j in range(k):
            s = s * _SHINGLE_MULT + th[j:j + m]
    return np.unique(s)


def shingle_hashes(text: str, k: int, cache: dict[str, np.uint64]) -> np.ndarray:
    """Distinct uint64 hashes of the k-word shingles of ``text``."""
    toks = normalize_tokens(text)
    if not toks:
        return np.array([_EMPTY_TOKEN_HASH], dtype=U64)
    return _roll_shingles(tokens_to_hashes(toks, cache), k)


def shingle_hashes_arrow_batch(texts, k: int,
                               cache: dict[str, np.uint64]) -> list[np.ndarray]:
    """Arrow-tokenized batch form of shingle_hashes — element-identical
    output (VERDICT r4 item 4: the pyarrow attempt after the numpy one
    measured slower).

    Tokenization (lower + whitespace split) and per-OCCURRENCE token
    dedup run in Arrow C kernels (ascii_lower, utf8_split_whitespace,
    dictionary_encode); Python touches each UNIQUE token once (blake2b
    through the shared memo cache) instead of probing a dict per token
    occurrence. The rolling combine then runs PER DOC over cache-sized
    slices — deliberately NOT over one concatenated array, which is the
    big-allocation pattern that stalled the numpy batch form on this
    host (see shingle_hashes_batch STATUS).

    Parity gate: Python str.lower() and Arrow differ on a few NON-ASCII
    code points (dotted capital İ, Greek final sigma — measured), so
    any non-ASCII document routes through the frozen per-doc Python
    path via pc.string_is_ascii. ASCII lowering/whitespace semantics
    were probed identical (incl. \\x1c-\\x1f controls and empty-token
    trimming). Gated by
    tests/test_kernels.py::test_shingle_hashes_arrow_matches_per_doc.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    py_texts = [("" if t is None else t) for t in texts]
    n = len(py_texts)
    if n == 0:
        return []
    arr = pa.array(py_texts, type=pa.string())
    is_ascii = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    toks = pc.utf8_split_whitespace(pc.ascii_lower(arr))
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    d = pc.dictionary_encode(pc.list_flatten(toks))
    codes = d.indices.to_numpy().astype(np.int64, copy=False)
    uniques = d.dictionary.to_pylist()
    uniq_h = np.empty(len(uniques), dtype=U64)
    empty_code = -1
    for j, u in enumerate(uniques):
        if u == "":
            empty_code = j
        h = cache.get(u)
        if h is None:
            h = token_hash(u)
            cache[u] = h
        uniq_h[j] = h
    if empty_code >= 0:
        # leading/trailing whitespace yields empty split tokens that
        # str.split() never produces — drop them and re-count per doc
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = codes != empty_code
        codes = codes[keep]
        lens = np.bincount(doc_idx[keep], minlength=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    out: list = [None] * n
    for i in range(n):
        if not is_ascii[i]:
            out[i] = shingle_hashes(py_texts[i], k, cache)
        else:
            out[i] = _roll_shingles(
                uniq_h[codes[starts[i]:starts[i + 1]]], k)
    return out


def shingle_hashes_batch(texts, k: int) -> list[np.ndarray]:
    """Batch form of shingle_hashes over a whole Arrow batch — output
    is ELEMENT-IDENTICAL per document (same token hashes, same rolling
    combine, same sorted-distinct order), but the per-token Python work
    drops from one dict probe + scalar store per TOKEN OCCURRENCE to
    one blake2b per UNIQUE token per batch:

    * all tokens of the batch factorize in C (pandas.factorize), and
      occurrence hashes come from one vectorized gather;
    * rolling shingle hashes compute in k shifted-add passes over the
      single CONCATENATED hash array; windows that straddle a document
      boundary are masked out vectorized (doc index of window start !=
      doc index of window end);
    * per-document sorted-distinct falls out of one lexsort over
      (doc, hash) + an adjacent-difference mask — the batched np.unique.

    STATUS — measured, NOT shipped (the A/B-verify pattern of
    BASELINE.md): on this sandbox VM the batch form runs 2-7x SLOWER
    than the per-doc kernel on fixture text despite doing strictly
    less Python work, because the VM's large-array allocations stall
    on page faults (fresh ~20 MB numpy temporaries measured at erratic
    10-100x op slowdowns; with preallocated outputs the same ufuncs
    run at full speed, so it is allocation, not compute). The per-doc
    kernel's KB-sized arrays never leave the CPU cache or the small-
    object allocator. Kept parity-tested
    (tests/test_kernels.py::test_shingle_hashes_batch_matches_per_doc)
    for hosts with sane huge-page behavior; re-measure before wiring
    into make_signature_udf.

    The CHUNKED middle ground (16-64 docs per concatenated segment +
    np.minimum.reduceat/np.add.reduceat segmented folds, temporaries
    capped at a few MB) was also measured (r4): minhash 0.44 -> 0.35 s
    /4k docs at chunk=32 (~20%, within window noise), chunked simhash
    3-5x SLOWER than per-doc, per-doc dict-memo token lookup FASTER
    than per-doc pd.factorize (0.17 vs 0.39 s — the cross-doc memo hit
    rate beats C factorization on web text's repeated vocabulary). No
    variant moves the signature stage materially on this host; the
    remaining headroom is a compiled tokenizer, out of scope here.

    r5 re-confirmation at full batch width: one-segment-per-doc
    reduceat minhash+simhash over 10k concatenated fixture docs
    measured 0.28x per-doc (5.1 s vs 1.4 s, min-of-5, exact parity) —
    reduceat's per-segment scalar loop plus the 256 MB bit-unpack
    temporary lose to the per-doc kernel's L1-resident outer products.
    The shipped hot path is therefore Arrow tokenization (see
    shingle_hashes_arrow_batch) + per-doc numpy folds."""
    import pandas as pd

    tok_lists = [normalize_tokens(t or "") for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    ndocs = len(tok_lists)
    res: list = [None] * ndocs

    all_toks = [t for toks in tok_lists for t in toks]
    if all_toks:
        codes, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
        uniq_hashes = np.fromiter(
            (token_hash(u) for u in uniques), dtype=U64, count=len(uniques))
        th_all = uniq_hashes[codes]
    else:
        th_all = np.empty(0, dtype=U64)

    total = int(lens.sum())
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    starts = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])

    m_total = total - k + 1
    if m_total > 0:
        with np.errstate(over="ignore"):
            s = np.zeros(m_total, dtype=U64)
            for j in range(k):
                s = s * _SHINGLE_MULT + th_all[j:j + m_total]
        valid = doc_idx[:m_total] == doc_idx[k - 1:]
        d = doc_idx[:m_total][valid]
        h = s[valid]
        order = np.lexsort((h, d))
        d_s, h_s = d[order], h[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        du, hu = d_s[first], h_s[first]
        cut = np.searchsorted(du, np.arange(ndocs + 1))
        for i in range(ndocs):
            if lens[i] >= k:
                res[i] = hu[cut[i]:cut[i + 1]]

    for i in range(ndocs):
        if res[i] is not None:
            continue
        n = int(lens[i])
        if n == 0:
            res[i] = np.array([_EMPTY_TOKEN_HASH], dtype=U64)
            continue
        th = th_all[starts[i]:starts[i] + n]
        with np.errstate(over="ignore"):
            acc = np.zeros(1, dtype=U64)
            for j in range(n):
                acc = acc * _SHINGLE_MULT + th[j]
        res[i] = acc
    return res


def minhash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) multiply-shift params: a odd uint64, b uint64.
    Analogue of the reference's HashParam rndAs/rndBs
    (src/def.h:24-34) generated once and broadcast."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * U64(2) + U64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a_i*s + b_i) mod 2^64,
    one value per hash function. Returns int64 view (Spark BIGINT)."""
    # (H, m) outer product with uint64 wraparound — the vectorized
    # analogue of calHash's per-function dot product (e2lsh.cpp:62-69).
    with np.errstate(over="ignore"):
        vals = a[:, None] * shingles[None, :] + b[:, None]
    return vals.min(axis=1).view(np.int64)


_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)


def _avalanche(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — scrambles the linear band fold so bucket
    keys are uniform (the same role xxhash64 played JVM-side)."""
    x = x ^ (x >> U64(30))
    x = x * _MIX1
    x = x ^ (x >> U64(27))
    x = x * _MIX2
    return x ^ (x >> U64(31))


def band_probe_keys(minhash: np.ndarray, bands: int, rows_per_band: int,
                    num_probes: int) -> np.ndarray:
    """(n_docs, num_hashes) minhash matrix -> (n_docs,
    bands*(1+num_probes)) int64 bucket keys, vectorized across the
    whole Arrow batch.

    Semantics are identical to the JVM band_probe_hashes
    (functions/hashing.py): key 0 of each band folds all rows_per_band
    MinHash values (two docs collide iff the band agrees), probes
    1..num_probes fold the band with row (p-1) left out (the
    leave-one-out multi-probe). The FOLD function differs (splitmix
    avalanche vs xxhash64) but any deterministic hash of the same
    values yields the same collision structure, so the emitted pair
    set is unchanged (modulo 2^-64 hash collisions). Moved into numpy
    because the JVM expression form (48 slice/concat allocations per
    row under an explode generator) measured ~6s per 100k docs and did
    not scale with cores; this is ~1000x fewer Python-side ops than
    per-doc hashing and costs ~ms per batch."""
    mh = minhash.view(U64)
    n = mh.shape[0]
    r = rows_per_band
    out = np.empty((n, bands * (1 + num_probes)), dtype=U64)
    col = 0
    with np.errstate(over="ignore"):
        for band in range(bands):
            sl = mh[:, band * r:(band + 1) * r]
            for p in range(num_probes + 1):
                h = np.full(n, _avalanche(
                    np.array([U64(band) * _MIX1 + U64(p) * _MIX2 + U64(1)],
                             dtype=U64))[0], dtype=U64)
                for j in range(r):
                    if p > 0 and j == p - 1:
                        continue
                    h = h * _SHINGLE_MULT + sl[:, j]
                out[:, col] = _avalanche(h)
                col += 1
    return out.view(np.int64)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over the shingle hash set: bit j of the result is
    the majority vote of bit j across shingle hashes. Returns int64."""
    bits = np.unpackbits(shingles.view(np.uint8).reshape(len(shingles), 8), axis=1)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 >= len(shingles)
    packed = np.packbits(votes.astype(np.uint8))
    return int(np.frombuffer(packed.tobytes(), dtype=np.uint64)[0].view(np.int64))


def exact_jaccard(text_a: str, text_b: str, k: int,
                  cache: dict[str, np.uint64] | None = None) -> float:
    """Exact word-shingle Jaccard — the verification kernel (maps the
    reference's exact re-ranking, src/basis.h:186-202, and
    jaccard_AVX512, src/distances_simd_avx512.cpp:416-420)."""
    if cache is None:
        cache = {}
    sa = shingle_hashes(text_a, k, cache)
    sb = shingle_hashes(text_b, k, cache)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return float(inter) / float(union) if union else 1.0


def hamming64(x: int, y: int) -> int:
    """Hamming distance between two 64-bit SimHash fingerprints."""
    return int(bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (substring pass)
# ---------------------------------------------------------------------------

def _codepoints(text: str) -> np.ndarray:
    """Text as a uint64 array of Unicode CODE POINTS (UTF-32 view).

    Both substring kernels (winnowing + LCS) index in code points, not
    UTF-8 bytes, so every length in the substring pass means CHARACTERS
    — matching config.min_substring_len's documented unit. A byte view
    silently shrank the effective char threshold up to 4x on CJK text
    and could match across partial multi-byte sequences (ADVICE r2)."""
    return np.frombuffer(
        text.encode("utf-32-le", errors="surrogatepass"), dtype=np.uint32
    ).astype(U64)


def winnow_fingerprints(text: str, kgram: int, window: int) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): distinct selected k-gram
    hashes such that any two texts sharing a substring of length
    >= window + kgram - 1 CHARACTERS share at least one fingerprint.
    Content-defined selection → offset-independent, so a verbatim span
    embedded at any position still collides (replaces a global suffix
    array with an embarrassingly parallel per-document pass).
    """
    arr = _codepoints(text)
    n = len(arr)
    if n < kgram:
        return np.empty(0, dtype=U64)
    m = n - kgram + 1
    # polynomial rolling hash of every k-gram, vectorized over positions
    h = np.zeros(m, dtype=U64)
    mult = _SHINGLE_MULT
    # O(kgram) shifted adds; kgram=64 → 64 vector ops over the doc
    with np.errstate(over="ignore"):
        for j in range(kgram):
            h = h * mult + arr[j:j + m]
    if m < window:
        # doc shorter than the guarantee length t = window + kgram - 1:
        # it cannot contain a qualifying span, emit nothing
        return np.empty(0, dtype=U64)
    # sliding-window minimum via stride tricks (robust winnowing: pick
    # the rightmost minimal hash in each window)
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    # rightmost min: reverse, argmin of reversed, map back
    rev = sw[:, ::-1]
    idx = (window - 1) - rev.argmin(axis=1)
    picks = h[np.arange(len(sw)) + idx]
    return np.unique(picks)


# modular inverse of the odd rolling-hash base mod 2^64 (odd => unit)
_SHINGLE_MULT_INV = U64(pow(int(_SHINGLE_MULT), -1, 1 << 64))


def _window_hashes(csum: np.ndarray, bpow: np.ndarray, L: int) -> np.ndarray:
    """All length-L window hashes of a byte string from its
    inverse-power prefix sums — O(n) per L, fully vectorized.

    With W[j] = byte[j] * B^-j and C = cumsum(W):
    hash(i, L) = (C[i+L-1] - C[i-1]) * B^(i+L-1)  (mod 2^64)."""
    n = len(csum)
    m = n - L + 1
    with np.errstate(over="ignore"):
        tail = csum[L - 1:]
        head = np.concatenate([np.zeros(1, dtype=U64), csum[: n - L]])
        return (tail - head) * bpow[L - 1: L - 1 + m]


def _hash_prefix(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(arr)
    with np.errstate(over="ignore"):
        binv = np.empty(n, dtype=U64)
        binv[0] = U64(1)
        if n > 1:
            binv[1:] = _SHINGLE_MULT_INV
            np.cumprod(binv, out=binv)
        bpow = np.empty(n, dtype=U64)
        bpow[0] = U64(1)
        if n > 1:
            bpow[1:] = _SHINGLE_MULT
            np.cumprod(bpow, out=bpow)
        csum = np.cumsum(arr * binv, dtype=U64)
    return csum, bpow


def longest_common_substring_len(a: str, b: str) -> int:
    """Longest-common-substring length in CHARACTERS (verification for
    the substring pass) via binary search over shared rolling-hash
    windows — O((n+m) log min(n,m)) numpy, replacing the O(n*m)
    GIL-bound difflib scan (VERDICT r1 'What's wrong' #5: a
    boilerplate-heavy corpus made the old form the bottleneck). A
    shared length-L window hash is accepted as a shared substring: with
    64-bit hashes over non-adversarial text the collision odds per
    comparison are ~2^-64 (same trust model as the winnowing candidate
    stage). Operates on Unicode code points (same unit as the winnowing
    kernel it verifies and as config.min_substring_len)."""
    da = _codepoints(a)
    db = _codepoints(b)
    if not len(da) or not len(db):
        return 0
    ca, pa = _hash_prefix(da)
    cb, pb = _hash_prefix(db)
    lo, hi = 0, min(len(da), len(db))  # lo = longest CONFIRMED length
    while lo < hi:
        mid = (lo + hi + 1) // 2
        ha = _window_hashes(ca, pa, mid)
        hb = _window_hashes(cb, pb, mid)
        if np.intersect1d(ha, hb).size:
            lo = mid
        else:
            hi = mid - 1
    return lo
