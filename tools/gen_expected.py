"""Independent pure-Python oracle for the three non-SQL-expressible queries.

``minhash_lsh_pairs``, ``simhash_pairs`` and ``ann_topk_lsh`` depend on hash
functions DuckDB cannot reproduce (Spark's xxhash64 seed chain, FNV-1a-64,
seeded numpy hyperplanes).  This script recomputes their expected outputs
from scratch — a from-first-principles reimplementation of the public
algorithms (XXH64 spec, FNV-1a spec, random-hyperplane LSH), sharing no code
with review_crawler_spark/operators/* — and records them per scale factor in
``expected/expected_pairs.json``.  ``__spark_entry__.oracle_sql()`` turns the
records into inline ``VALUES`` tables gated on ``(SELECT count(*) FROM
documents|embeddings)``, so the driver's DuckDB side selects the right
expectation for whatever SF it runs.

Run:  python tools/gen_expected.py [sf_dir ...]
Defaults to /root/testdata/sf0.001 sf0.01 sf0.1.

Cross-checked against Spark by tests/test_expected_oracle.py (xxhash64
parity on samples + full query equality at sf0.001).
"""

from __future__ import annotations

import json
import os
import re
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------- XXH64
# Public xxHash-64 spec (Yann Collet); Spark's XxHash64 expression chains
# column hashes with seed 42 and hashes ints/longs as 4/8-byte LE words.

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of a byte string (little-endian word reads)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = struct.unpack_from("<Q", data, off + 8 * i)[0]
                v = (v + k * P2) & MASK64
                v = (_rotl(v, 31) * P1) & MASK64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * P2) & MASK64, 31) * P1) & MASK64
            h = ((h ^ k) * P1 + P4) & MASK64
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while off + 8 <= n:
        k = struct.unpack_from("<Q", data, off)[0]
        k = (_rotl((k * P2) & MASK64, 31) * P1) & MASK64
        h = (_rotl(h ^ k, 27) * P1 + P4) & MASK64
        off += 8
    if off + 4 <= n:
        k = struct.unpack_from("<I", data, off)[0]
        h = (_rotl(h ^ ((k * P1) & MASK64), 23) * P2 + P3) & MASK64
        off += 4
    while off < n:
        h = (_rotl(h ^ ((data[off] * P5) & MASK64), 11) * P1) & MASK64
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*cols) -> int:
    """Spark ``F.xxhash64(c1, c2, ...)``: fold over columns with seed 42.

    str → XXH64 of UTF-8 bytes; ('int', v) → 4-byte LE; plain int → 8-byte
    LE (LongType).  Returns the signed 64-bit value Spark yields.
    """
    h = 42
    for c in cols:
        if isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        elif isinstance(c, tuple) and c[0] == "int":
            h = xxh64(struct.pack("<i", c[1]), h)
        else:
            h = xxh64(struct.pack("<Q", c & MASK64), h)
    return _to_signed(h)


# ---------------------------------------------------------------- text

_PUNCT = re.compile(r"[^\w\s]", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)


def normalize(s: str) -> str:
    return _WS.sub(" ", _PUNCT.sub("", s.lower())).strip()


def shingles(s: str, k: int) -> list[str]:
    words = normalize(s).split(" ")
    if len(words) < k:
        return []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def round_half_up(x: float, digits: int) -> float:
    """Spark F.round on doubles: BigDecimal(shortest-repr).setScale(HALF_UP)."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-digits), ROUND_HALF_UP))


# ---------------------------------------------------------------- minhash

def minhash_expected(ids, texts, num_hashes=32, bands=8, shingle_k=3, thr=0.5):
    rows_per_band = num_hashes // bands
    lane_cache: dict[str, list[int]] = {}

    def lanes_of(sh: str) -> list[int]:
        # lane i = xxhash64(xxhash64(shingle), i): string hashed once (seed
        # 42), then per-lane chain hashLong(base, 42) -> hashInt(i, ·)
        got = lane_cache.get(sh)
        if got is None:
            base = xxh64(sh.encode("utf-8"), 42)
            h_long = xxh64(struct.pack("<Q", base), 42)
            got = [
                _to_signed(xxh64(struct.pack("<i", i), h_long))
                for i in range(num_hashes)
            ]
            lane_cache[sh] = got
        return got

    sets: dict[int, frozenset] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(ids, texts):
        sh = shingles(text, shingle_k)
        if not sh:
            continue
        sets[doc_id] = frozenset(sh)
        sig = [
            min(lanes_of(s)[i] for s in sh) for i in range(num_hashes)
        ]
        for b in range(bands):
            key = spark_xxhash64(*sig[b * rows_per_band : (b + 1) * rows_per_band])
            buckets.setdefault((b, key), []).append(doc_id)

    cand = set()
    for members in buckets.values():
        if len(members) > 1:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cand):
        sa, sb = sets[a], sets[b]
        jac = round_half_up(len(sa & sb) / len(sa | sb), 6)
        if jac >= thr:
            out.append((a, b, jac))
    return out


def slice_probe_expected(
    ids, texts, slice_mod=20, num_hashes=32, bands=8, shingle_k=3,
    est_threshold=0.4,
):
    """Incremental slice-vs-corpus-index probe: corpus = doc_id %
    slice_mod != 0, slice = the rest. Lock-step lane/band math with
    minhash_expected (same xxh64 chain, same band keys); the estimate is
    the agreeing-lane fraction, HALF_UP(6), thresholded — exactly what
    operators/dedup.minhash_probe_index computes on the joined row."""
    rows_per_band = num_hashes // bands
    lane_cache: dict[str, list[int]] = {}

    def lanes_of(sh: str) -> list[int]:
        got = lane_cache.get(sh)
        if got is None:
            base = xxh64(sh.encode("utf-8"), 42)
            h_long = xxh64(struct.pack("<Q", base), 42)
            got = [
                _to_signed(xxh64(struct.pack("<i", i), h_long))
                for i in range(num_hashes)
            ]
            lane_cache[sh] = got
        return got

    sigs: dict[int, list[int]] = {}
    for doc_id, text in zip(ids, texts):
        sh = shingles(text, shingle_k)
        if not sh:
            continue
        sigs[doc_id] = [
            min(lanes_of(s)[i] for s in sh) for i in range(num_hashes)
        ]

    corpus_buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        if doc_id % slice_mod == 0:
            continue
        for b in range(bands):
            key = spark_xxhash64(*sig[b * rows_per_band : (b + 1) * rows_per_band])
            corpus_buckets.setdefault((b, key), []).append(doc_id)

    pairs: set[tuple[int, int]] = set()
    for doc_id, sig in sigs.items():
        if doc_id % slice_mod != 0:
            continue
        for b in range(bands):
            key = spark_xxhash64(*sig[b * rows_per_band : (b + 1) * rows_per_band])
            for cid in corpus_buckets.get((b, key), ()):
                pairs.add((doc_id, cid))
    out = []
    for sid, cid in sorted(pairs):
        agree = sum(
            1 for a, b in zip(sigs[sid], sigs[cid]) if a == b
        )
        est = round_half_up(agree / num_hashes, 6)
        if est >= est_threshold:
            out.append((sid, cid, est))
    return out


# ---------------------------------------------------------------- simhash

def _fnv1a64(b: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) & MASK64
    return h


def simhash_expected(ids, texts, max_hamming=3):
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    mask = (1 << bits) - 1
    tok_cache: dict[str, int] = {}
    hashes: dict[int, int] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(ids, texts):
        acc = [0] * 64
        for tok in normalize(text).split(" "):
            h = tok_cache.get(tok)
            if h is None:
                h = _fnv1a64(tok.encode("utf-8"))
                tok_cache[tok] = h
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        sim = 0
        for b in range(64):
            if acc[b] > 0:
                sim |= 1 << b
        hashes[doc_id] = sim
        for c in range(n_chunks):
            buckets.setdefault((c, (sim >> (c * bits)) & mask), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        if len(members) > 1:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    ham = bin(hashes[ms[i]] ^ hashes[ms[j]]).count("1")
                    if ham <= max_hamming:
                        pairs.add((ms[i], ms[j], ham))
    return sorted(pairs)


# ---------------------------------------------------------------- ann lsh

def clusters_expected(pairs):
    """Union-find over the minhash verified pairs → (doc_id, cluster_id,
    cluster_size), cluster_id = min member. A from-first-principles check
    of operators/components.connected_components, which computes the same
    partition by iterative min-label propagation on Spark."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {x: find(x) for x in parent}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    return sorted((x, c, sizes[c]) for x, c in comp.items())


def ann_lsh_expected(vec_ids, mat, query, k=10, num_planes=12, max_hamming=2, seed=42):
    dim = len(query)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    q = np.asarray(query, dtype=np.float64)
    sig_bits = (mat @ planes) > 0
    sigs = np.zeros(len(vec_ids), dtype=np.int64)
    for b in range(num_planes):
        sigs |= sig_bits[:, b].astype(np.int64) << b
    qbits = (q @ planes) > 0
    qsig = 0
    for b in range(num_planes):
        qsig |= int(qbits[b]) << b
    ham = np.array([bin(int(s) ^ qsig).count("1") for s in sigs])
    cand = ham <= max_hamming

    # Spark-exact cosine: strict left-to-right double folds, then HALF_UP(6).
    qn = float(np.sqrt(np.dot(q, q)))
    scored = []
    for i in np.nonzero(cand)[0]:
        v = mat[i]
        dot = 0.0
        nrm = 0.0
        for j in range(dim):
            dot += v[j] * q[j]
            nrm += v[j] * v[j]
        cos = round_half_up(dot / (np.sqrt(nrm) * qn), 6)
        scored.append((int(vec_ids[i]), cos))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


# ---------------------------------------------------------------- ivf

def ann_ivf_expected(
    vec_ids, mat, query, k=10, n_centroids=16, nprobe=4, train_n=2000, iters=5
):
    """IVF top-k: deterministic Lloyd's quantizer (init = first k sample
    rows, fixed iters, per-centroid distance loop — the float recipe
    operators/similarity._kmeans_fit commits to), probe nprobe nearest
    lists, exact sequential-fold cosine rescore."""
    def unit(m):
        norms = np.sqrt((m ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        return m / norms[:, None]

    sample = unit(mat[:train_n].astype(np.float64))
    # lock-step with similarity._kmeans_fit: fewer rows than requested
    # centroids degrades to one centroid per row
    n_centroids = min(n_centroids, len(sample))
    centroids = sample[:n_centroids].copy()
    for _ in range(iters):
        dists = np.stack(
            [((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        assign = dists.argmin(axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    qu = unit(np.asarray(query, dtype=np.float64)[None, :])[0]
    qd = np.array([((qu - c) ** 2).sum() for c in centroids])
    probe = set(int(b) for b in qd.argsort(kind="stable")[:nprobe])
    mat_u = unit(mat.astype(np.float64))
    all_d = np.stack([((mat_u - c) ** 2).sum(axis=1) for c in centroids], axis=1)
    buckets = all_d.argmin(axis=1)
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt(np.dot(q, q)))
    scored = []
    dim = len(query)
    for i in range(len(vec_ids)):
        if int(buckets[i]) not in probe:
            continue
        v = mat[i]
        dot = 0.0
        nrm = 0.0
        for j in range(dim):
            dot += v[j] * q[j]
            nrm += v[j] * v[j]
        scored.append((int(vec_ids[i]), round_half_up(dot / (np.sqrt(nrm) * qn), 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def ann_pq_expected(
    vec_ids, mat, query, k=10, m=8, ks=16, rerank=50, train_n=2000, iters=5
):
    """PQ ADC top-k: per-subspace deterministic Lloyd's codebooks (init =
    first ks sub-rows, fixed iters — the float recipe
    operators/similarity.pq_train_codebooks commits to), ADC lookup-table
    scan over the codes, exact Spark-fold cosine rescore of the top
    ``rerank`` candidates (ties at the boundary break on id, both here and
    in the operator)."""
    def unit(a):
        norms = np.sqrt((a ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        return a / norms[:, None]

    dim = len(query)
    sub = dim // m
    sample = unit(mat[:train_n].astype(np.float64))
    books = []
    for j in range(m):
        block = sample[:, j * sub:(j + 1) * sub]
        kk = min(ks, len(block))
        cb = block[:kk].copy()
        for _ in range(iters):
            dists = np.stack([((block - c) ** 2).sum(axis=1) for c in cb], axis=1)
            assign = dists.argmin(axis=1)
            for c in range(kk):
                members = block[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    books = np.stack(books)

    mat_u = unit(mat.astype(np.float64))
    codes = np.zeros((len(vec_ids), m), dtype=np.int64)
    for j in range(m):
        block = mat_u[:, j * sub:(j + 1) * sub]
        dists = np.stack(
            [((block - c) ** 2).sum(axis=1) for c in books[j]], axis=1
        )
        codes[:, j] = dists.argmin(axis=1)

    qu = unit(np.asarray(query, dtype=np.float64)[None, :])[0]
    table = np.stack(
        [((books[j] - qu[j * sub:(j + 1) * sub]) ** 2).sum(axis=1)
         for j in range(m)]
    )
    adc = np.take_along_axis(table, codes.T, axis=1).sum(axis=0)
    order = sorted(range(len(vec_ids)), key=lambda i: (adc[i], int(vec_ids[i])))
    cand = order[:rerank]

    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt(np.dot(q, q)))
    scored = []
    for i in cand:
        v = mat[i]
        dot = 0.0
        nrm = 0.0
        for j in range(dim):
            dot += v[j] * q[j]
            nrm += v[j] * v[j]
        scored.append((int(vec_ids[i]), round_half_up(dot / (np.sqrt(nrm) * qn), 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def semantic_dedup_expected(
    vec_ids, mat, n_centroids=16, threshold=0.4, train_n=2000, iters=5
):
    """SemDeDup clusters: lock-step spherical k-means (the float recipe
    operators/similarity._kmeans_fit commits to), nearest-centroid cells,
    within-cell sequential-fold cosine (the exact zip_with/aggregate fold
    order operators/dedup.embedding_near_dup_pairs uses, HALF_UP(6) before
    the threshold test), union-find over the surviving pairs."""
    def unit(m):
        norms = np.sqrt((m ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        return m / norms[:, None]

    sample = unit(mat[:train_n].astype(np.float64))
    k = min(n_centroids, len(sample))
    centroids = sample[:k].copy()
    for _ in range(iters):
        dists = np.stack(
            [((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        assign = dists.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    mat_u = unit(mat.astype(np.float64))
    cells = np.stack(
        [((mat_u - c) ** 2).sum(axis=1) for c in centroids], axis=1
    ).argmin(axis=1)

    dim = mat.shape[1]

    def seq_norm(v):
        acc = 0.0
        for j in range(dim):
            acc += v[j] * v[j]
        return float(np.sqrt(acc))

    def seq_dot(a, b):
        acc = 0.0
        for j in range(dim):
            acc += a[j] * b[j]
        return acc

    by_cell: dict[int, list[int]] = {}
    for i in range(len(vec_ids)):
        by_cell.setdefault(int(cells[i]), []).append(i)
    norms = [seq_norm(mat[i]) for i in range(len(vec_ids))]
    pairs = []
    for members in by_cell.values():
        members = sorted(members, key=lambda i: vec_ids[i])
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]
                cos = round_half_up(
                    seq_dot(mat[a], mat[b]) / (norms[a] * norms[b]), 6
                )
                if cos >= threshold:
                    pairs.append((int(vec_ids[a]), int(vec_ids[b]), cos))
    return clusters_expected(pairs)


def ann_ivf_batch_expected(
    vec_ids, mat, n_queries=3, k=10, n_centroids=16, nprobe=4, train_n=2000,
    iters=5,
):
    """Batch IVF probe expectation — lock-step with
    operators/similarity.ann_topk_ivf_indexed_batch: identical quantizer
    fit (shared recipe), probe assignment per query (unit-normalized,
    per-centroid squared distance, stable argsort), and an all-sequential
    float64 fold for dot AND both norms (the JVM aggregate() fold order).
    Queries are the first n_queries rows (smallest vec_ids — the entry
    query selects the same)."""
    def unit(m):
        norms = np.sqrt((m ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        return m / norms[:, None]

    sample = unit(mat[:train_n].astype(np.float64))
    n_centroids = min(n_centroids, len(sample))
    centroids = sample[:n_centroids].copy()
    for _ in range(iters):
        dists = np.stack(
            [((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        assign = dists.argmin(axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    mat_u = unit(mat.astype(np.float64))
    all_d = np.stack([((mat_u - c) ** 2).sum(axis=1) for c in centroids], axis=1)
    buckets = all_d.argmin(axis=1)

    def seq_fold_dot(a, b):
        acc = 0.0
        for j in range(len(a)):
            acc += float(a[j]) * float(b[j])
        return acc

    rows = []
    dim = mat.shape[1]
    for qi in range(min(n_queries, len(vec_ids))):
        qid = int(vec_ids[qi])
        q = mat[qi].astype(np.float64)
        qu = unit(q[None, :])[0]
        qd = np.stack([((qu - c) ** 2).sum() for c in centroids])
        probe = set(int(b) for b in qd.argsort(kind="stable")[:nprobe])
        qn = np.sqrt(seq_fold_dot(q, q))
        scored = []
        for i in range(len(vec_ids)):
            if int(buckets[i]) not in probe:
                continue
            v = mat[i].astype(np.float64)
            dot = seq_fold_dot(v, q)
            nrm = np.sqrt(seq_fold_dot(v, v))
            scored.append(
                (int(vec_ids[i]), round_half_up(dot / (nrm * qn), 6))
            )
        scored.sort(key=lambda t: (-t[1], t[0]))
        rows.extend([qid, vid, c] for vid, c in scored[:k])
    return rows


def ann_ivfpq_batch_expected(
    vec_ids, mat, n_queries=3, k=10, n_centroids=16, nprobe=4, rerank=50,
    m=8, ks=16, train_n=2000, iters=5,
):
    """Batch IVF-PQ probe expectation — lock-step with
    operators/similarity.write_ivfpq_index + ann_topk_ivfpq_indexed_batch:
    identical coarse quantizer fit, PQ codebooks trained on the SAMPLE's
    residuals (init = first ks sub-rows, fixed iters, NO row
    normalization), residual codes for every vector, per-query ADC =
    Σ_j ‖(qu − c_b)_j − book_j[code_j]‖² over probed buckets, top-rerank
    by (adc, id), exact all-sequential-fold cosine rescore, top-k by
    (-cos, id). Queries are the first n_queries rows."""
    def unit(a):
        norms = np.sqrt((a ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        return a / norms[:, None]

    sample = unit(mat[:train_n].astype(np.float64))
    n_centroids = min(n_centroids, len(sample))
    centroids = sample[:n_centroids].copy()
    for _ in range(iters):
        dists = np.stack(
            [((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        assign = dists.argmin(axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)

    dim = mat.shape[1]
    sub = dim // m
    sd = np.stack([((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1)
    sample_resid = sample - centroids[sd.argmin(axis=1)]
    books = []
    for j in range(m):
        block = sample_resid[:, j * sub:(j + 1) * sub]
        kk = min(ks, len(block))
        cb = block[:kk].copy()
        for _ in range(iters):
            dd = np.stack([((block - c) ** 2).sum(axis=1) for c in cb], axis=1)
            assign = dd.argmin(axis=1)
            for c in range(kk):
                members = block[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    books = np.stack(books)

    mat_u = unit(mat.astype(np.float64))
    all_d = np.stack([((mat_u - c) ** 2).sum(axis=1) for c in centroids], axis=1)
    buckets = all_d.argmin(axis=1)
    resid = mat_u - centroids[buckets]
    codes = np.zeros((len(vec_ids), m), dtype=np.int64)
    for j in range(m):
        block = resid[:, j * sub:(j + 1) * sub]
        dd = np.stack([((block - c) ** 2).sum(axis=1) for c in books[j]], axis=1)
        codes[:, j] = dd.argmin(axis=1)

    def seq_fold_dot(a, b):
        acc = 0.0
        for j in range(len(a)):
            acc += float(a[j]) * float(b[j])
        return acc

    rows = []
    for qi in range(min(n_queries, len(vec_ids))):
        qid = int(vec_ids[qi])
        q = mat[qi].astype(np.float64)
        qu = unit(q[None, :])[0]
        qd = np.stack([((qu - c) ** 2).sum() for c in centroids])
        probe = [int(b) for b in qd.argsort(kind="stable")[:nprobe]]
        probe_set = set(probe)
        # ADC per candidate in a probed bucket: the query residual is taken
        # w.r.t. the candidate's OWN bucket centroid (same as the operator,
        # which joins each probed (bucket, resid) pair against that bucket)
        qresid = {b: qu - centroids[b] for b in probe}
        cand = []
        for i in range(len(vec_ids)):
            b = int(buckets[i])
            if b not in probe_set:
                continue
            adc = 0.0
            qr = qresid[b]
            for j in range(m):
                diff = qr[j * sub:(j + 1) * sub] - books[j][codes[i, j]]
                adc += float((diff ** 2).sum())
            cand.append((adc, int(vec_ids[i]), i))
        cand.sort(key=lambda t: (t[0], t[1]))
        cand = cand[:rerank]
        qn = np.sqrt(seq_fold_dot(q, q))
        scored = []
        for _, vid, i in cand:
            v = mat[i].astype(np.float64)
            dot = seq_fold_dot(v, q)
            nrm = np.sqrt(seq_fold_dot(v, v))
            scored.append((vid, round_half_up(dot / (nrm * qn), 6)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        rows.extend([qid, vid, c] for vid, c in scored[:k])
    return rows


# ---------------------------------------------------------------- BPE


def bpe_expected(ids, texts, num_merges=24):
    """Independent reference BPE (operators/bpe.py twin): word-freq counter,
    per-round argmax on (count desc, pair asc), leftmost non-overlapping
    merge. Returns (merges rows, per-doc token-count rows)."""
    from collections import Counter

    wf: Counter = Counter()
    doc_words: list[list[str]] = []
    for t in texts:
        ws = [w for w in normalize(t).split(" ") if w]
        doc_words.append(ws)
        wf.update(ws)
    words = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b) = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append([rank, a, b, a + b])
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    counts = [
        [
            did,
            len(ws),
            sum(len(words[w]) for w in ws),
        ]
        for did, ws in zip(ids, doc_words)
    ]
    return merges, counts


# ---------------------------------------------------------------- driver

ALL_KEYS = (
    "minhash_lsh_pairs", "simhash_pairs", "ann_topk_lsh", "ann_topk_ivf",
    "ann_topk_ivf_batch", "ann_topk_pq", "ann_topk_ivfpq_batch",
    "dedup_clusters", "semantic_dedup_clusters", "dedup_slice_probe",
    "bpe_merges", "bpe_token_counts",
)


def generate(sf_dirs, only: set[str] | None = None):
    """Recompute expectations; with ``only``, recompute just those keys and
    merge into the existing expected_pairs.json (the text-side expectations
    take minutes of pure Python at sf0.1 — adding one embedding-side
    operator must not force a full regeneration)."""
    import duckdb

    con = duckdb.connect()
    path = os.path.join(
        os.path.dirname(__file__), "..", "expected", "expected_pairs.json"
    )
    keys = set(only) if only else set(ALL_KEYS)
    unknown = keys - set(ALL_KEYS)
    if unknown:
        raise SystemExit(f"unknown expectation keys: {sorted(unknown)}")
    out = {k: [] for k in ALL_KEYS}
    if only and os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        for k, v in prev.items():
            if k not in keys:
                out[k] = v
    for sf_dir in sf_dirs:
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
        ids = [r[0] for r in docs]
        texts = [r[1] for r in docs]
        n_docs = len(ids)
        # count alone is ambiguous across SFs (sf0.001 and sf0.01 both have
        # 500 docs) — gate on count:sum(n_chars), a content checksum DuckDB
        # recomputes from the pre-registered views at driver time.
        sum_chars = con.execute(
            f"SELECT CAST(sum(n_chars) AS BIGINT) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        doc_gate = f"{n_docs}:{sum_chars}"
        print(f"{sf_dir}: {n_docs} docs gate={doc_gate}", flush=True)
        if keys & {"minhash_lsh_pairs", "dedup_clusters"}:
            mh = minhash_expected(ids, texts)
            print(f"  minhash pairs: {len(mh)}", flush=True)
        if "minhash_lsh_pairs" in keys:
            out["minhash_lsh_pairs"].append(
                {"gate": doc_gate, "rows": [[a, b, j] for a, b, j in mh]}
            )
        if "simhash_pairs" in keys:
            sh = simhash_expected(ids, texts)
            print(f"  simhash pairs: {len(sh)}", flush=True)
            out["simhash_pairs"].append(
                {"gate": doc_gate, "rows": [[a, b, h] for a, b, h in sh]}
            )
        if "dedup_clusters" in keys:
            cl = clusters_expected(mh)
            print(f"  clusters: {len(cl)} members", flush=True)
            out["dedup_clusters"].append(
                {"gate": doc_gate, "rows": [[i, c, s] for i, c, s in cl]}
            )
        if "dedup_slice_probe" in keys:
            sp = slice_probe_expected(ids, texts)
            print(f"  slice-probe rows: {len(sp)}", flush=True)
            out["dedup_slice_probe"].append(
                {"gate": doc_gate, "rows": [[a, b, e] for a, b, e in sp]}
            )
        if keys & {"bpe_merges", "bpe_token_counts"}:
            bm, bc = bpe_expected(ids, texts)
            print(f"  bpe merges: {len(bm)}, token-count rows: {len(bc)}",
                  flush=True)
            if "bpe_merges" in keys:
                out["bpe_merges"].append({"gate": doc_gate, "rows": bm})
            if "bpe_token_counts" in keys:
                out["bpe_token_counts"].append({"gate": doc_gate, "rows": bc})

        emb = con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        vec_ids = [r[0] for r in emb]
        mat = np.array([r[1] for r in emb], dtype=np.float64)
        query = [((i * 37 + 11) % 19 - 9) / 10.0 for i in range(mat.shape[1])]
        vec_gate = f"{len(vec_ids)}:{sum_chars}"
        if "ann_topk_lsh" in keys:
            ann = ann_lsh_expected(vec_ids, mat, query)
            print(f"  ann rows: {len(ann)} over {len(vec_ids)} vectors", flush=True)
            out["ann_topk_lsh"].append(
                {"gate": vec_gate, "rows": [[v, c] for v, c in ann]}
            )
        if "ann_topk_ivf" in keys:
            ivf = ann_ivf_expected(vec_ids, mat, query)
            print(f"  ivf rows: {len(ivf)}", flush=True)
            out["ann_topk_ivf"].append(
                {"gate": vec_gate, "rows": [[v, c] for v, c in ivf]}
            )
        if "ann_topk_ivf_batch" in keys:
            ivfb = ann_ivf_batch_expected(vec_ids, mat)
            print(f"  ivf batch rows: {len(ivfb)}", flush=True)
            out["ann_topk_ivf_batch"].append({"gate": vec_gate, "rows": ivfb})
        if "ann_topk_pq" in keys:
            pq = ann_pq_expected(vec_ids, mat, query)
            print(f"  pq rows: {len(pq)}", flush=True)
            out["ann_topk_pq"].append(
                {"gate": vec_gate, "rows": [[v, c] for v, c in pq]}
            )
        if "ann_topk_ivfpq_batch" in keys:
            ivfpq = ann_ivfpq_batch_expected(vec_ids, mat)
            print(f"  ivfpq batch rows: {len(ivfpq)}", flush=True)
            out["ann_topk_ivfpq_batch"].append({"gate": vec_gate, "rows": ivfpq})
        if "semantic_dedup_clusters" in keys:
            sd = semantic_dedup_expected(vec_ids, mat)
            print(f"  semantic dedup members: {len(sd)}", flush=True)
            out["semantic_dedup_clusters"].append(
                {"gate": vec_gate, "rows": [[i, c, s] for i, c, s in sd]}
            )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    dirs = argv or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    generate(dirs, only=only)
