"""ANN operators: brute-force exactness + LSH recall vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest

from review_crawler_spark.operators import similarity as S

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors — the realistic ANN regime (neighbors are close)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, DIM))
    idx = rng.integers(0, 20, size=300)
    vecs = (centers[idx] + 0.15 * rng.standard_normal((300, DIM))).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], int(idx[i])) for i in range(300)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ), vecs, centers


def brute_topk(vecs: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(vecs)), key=lambda i: (-round(cos[i], 6), i))
    return order[:k]


def test_cosine_topk_matches_numpy(emb):
    df, vecs, centers = emb
    q = centers[3]
    got = [r["vec_id"] for r in S.cosine_topk(df, list(q), k=10).collect()]
    assert got == brute_topk(vecs, q, 10)


def test_ann_lsh_recall(emb):
    df, vecs, centers = emb
    recalls = []
    for c in (1, 4, 9):
        q = centers[c]
        exact = set(brute_topk(vecs, q, 10))
        approx = {
            r["vec_id"]
            for r in S.ann_topk_lsh(
                df, list(q), k=10, num_planes=12, max_hamming=3
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, f"LSH recall too low: {recalls}"


def test_hyperplane_signatures_deterministic(emb):
    df, _, _ = emb
    s1 = {r["vec_id"]: r["sig"] for r in S.hyperplane_signatures(df, dim=DIM).collect()}
    s2 = {r["vec_id"]: r["sig"] for r in S.hyperplane_signatures(df, dim=DIM).collect()}
    assert s1 == s2


def test_ann_ivf_recall_vs_bruteforce(emb):
    """IVF with nprobe=4/16 must recover most of the exact top-10 (recall
    depends on the quantizer; the floor asserts the probe path works)."""
    from review_crawler_spark.operators.similarity import ann_topk_ivf, cosine_topk

    query = [((i * 37 + 11) % 19 - 9) / 10.0 for i in range(DIM)]
    df, _, _ = emb
    exact = {r["vec_id"] for r in cosine_topk(df, query, k=10).collect()}
    approx = {r["vec_id"] for r in ann_topk_ivf(df, query, k=10).collect()}
    assert len(approx & exact) >= 5
    # widest probe = exhaustive: must equal brute force exactly
    full = {r["vec_id"] for r in ann_topk_ivf(
        df, query, k=10, n_centroids=8, nprobe=8).collect()}
    assert full == exact


def test_pq_encode_shape_and_determinism(emb):
    df, vecs, _ = emb
    books = S.pq_train_codebooks(vecs[:100], m=4, ks=8)
    assert books.shape == (4, 8, DIM // 4)
    c1 = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(df, books).collect()}
    c2 = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(df, books).collect()}
    assert c1 == c2
    assert all(len(v) == 4 and all(0 <= c < 8 for c in v) for v in c1.values())


def test_pq_encode_matches_numpy_replica(emb):
    """Lock-step: the operator's codes equal an independent scalar-loop
    assignment over the same codebooks."""
    df, vecs, _ = emb
    books = S.pq_train_codebooks(vecs[:100], m=4, ks=8)
    got = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(df, books).collect()}
    u = vecs.astype(np.float64)
    u = u / np.linalg.norm(u, axis=1)[:, None]
    sub = DIM // 4
    for i in range(len(vecs)):
        want = []
        for j in range(4):
            block = u[i, j * sub:(j + 1) * sub]
            d = ((books[j] - block) ** 2).sum(axis=1)
            want.append(int(d.argmin()))
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


def test_ann_pq_recall_vs_bruteforce(emb):
    """ADC + rerank must recover most of the exact top-10; with rerank
    covering the whole corpus the result IS brute force (the ADC pass only
    orders candidates — the rescore is exact)."""
    query = [((i * 37 + 11) % 19 - 9) / 10.0 for i in range(DIM)]
    df, vecs, _ = emb
    exact = [r["vec_id"] for r in S.cosine_topk(df, query, k=10).collect()]
    approx = {r["vec_id"] for r in S.ann_topk_pq(
        df, query, k=10, m=4, ks=16, rerank=50).collect()}
    assert len(approx & set(exact)) >= 7, f"PQ recall too low: {approx}"
    full = [r["vec_id"] for r in S.ann_topk_pq(
        df, query, k=10, m=4, ks=16, rerank=len(vecs)).collect()]
    assert full == exact


def test_pq_train_rejects_indivisible_dim(emb):
    _, vecs, _ = emb
    with pytest.raises(ValueError):
        S.pq_train_codebooks(vecs[:50], m=5, ks=8)
