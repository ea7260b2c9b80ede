"""DSIR importance resampling (operators/dsir.py) — weights vs a pure-
Python reference (same md5 bucket hash, same quantization), semantic
ordering (target-like text outranks off-target text), determinism under
repartitioning, and the broadcast-score-dim plan."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from review_crawler_spark.operators.dsir import (
    N_BUCKETS,
    dsir_bucket_scores,
    dsir_importance_weights,
    dsir_select_topk,
)

TARGET = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox likes the lazy dog"),
    (3, "a quick brown fox and a lazy dog"),
]
RAW = TARGET + [
    (10, "the quick brown fox jumps over the lazy dog again"),
    (11, "buy cheap pills online buy cheap pills online"),
    (12, "stock market prices fell sharply on tuesday"),
    (13, "x"),  # single token: no bigrams, absent from output
]


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^\w\s]", "", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ") if t else []


def _bucket(gram: str, n_buckets: int = N_BUCKETS) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n_buckets


def py_weights(target, raw, n_buckets: int = N_BUCKETS) -> dict[int, tuple]:
    def occs(docs):
        out = []
        for i, text in docs:
            w = _norm_words(text)
            out += [(i, _bucket(f"{a} {b}", n_buckets))
                    for a, b in zip(w, w[1:])]
        return out

    t_occ, r_occ = occs(target), occs(raw)
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, b in t_occ:
        tc[b] = tc.get(b, 0) + 1
    for _, b in r_occ:
        rc[b] = rc.get(b, 0) + 1
    tt, rt = len(t_occ), len(r_occ)
    score = {
        b: round(
            (math.log((tc.get(b, 0) + 1) / (tt + n_buckets))
             - math.log((rc[b] + 1) / (rt + n_buckets))) * 1e4
        )
        for b in rc
    }
    out: dict[int, tuple] = {}
    for i, b in r_occ:
        n, w = out.get(i, (0, 0))
        out[i] = (n + 1, w + score[b])
    return out


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, ["doc_id", "text"])
    return t, r


def test_weights_match_python_reference(frames):
    t, r = frames
    scores = dsir_bucket_scores(t, r)
    got = {
        row["doc_id"]: (row["n_grams"], row["weight_e4"])
        for row in dsir_importance_weights(r, scores).collect()
    }
    assert got == py_weights(TARGET, RAW)


def test_target_like_docs_outrank_spam(frames):
    t, r = frames
    top = [row["doc_id"] for row in dsir_select_topk(t, r, 3).collect()]
    # the three highest-weight docs are target members / near-target text,
    # never the spam or off-domain rows
    assert set(top).issubset({1, 2, 3, 10})
    bottom = dsir_select_topk(t, r, 6).collect()[-1]["doc_id"]
    assert bottom in (11, 12)


def test_no_bigram_docs_absent_and_k_validation(frames):
    t, r = frames
    ids = {row["doc_id"] for row in dsir_select_topk(t, r, 100).collect()}
    assert 13 not in ids and len(ids) == 6
    with pytest.raises(ValueError):
        dsir_select_topk(t, r, 0)


def test_weights_invariant_under_repartitioning(frames):
    t, r = frames
    a = dsir_select_topk(t, r, 6).collect()
    b = dsir_select_topk(t.repartition(7), r.repartition(5), 6).collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]


def test_plan_broadcasts_score_dim(frames):
    t, r = frames
    scores = dsir_bucket_scores(t, r)
    plan = (
        dsir_importance_weights(r, scores)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
