"""Global deterministic shuffle: dense-position contract, equivalence to
the single-task global rank, partitioning invariance, shard balance —
and TF-IDF top-k ranking vs a pure-Python expectation."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from review_crawler_spark.operators.ordering import global_shuffle
from review_crawler_spark.operators.tfidf import tfidf_topk_terms


def _docs(spark, n=500, parts=7):
    rows = [(f"doc{i:04d}", i) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, val int").repartition(
        parts
    )


def _py_order(keys, salt):
    return sorted(
        keys, key=lambda k: (hashlib.md5((k + salt).encode()).hexdigest()[:15], k)
    )


def test_global_shuffle_matches_single_task_rank(spark):
    df = _docs(spark)
    out = {
        r["doc_id"]: r["position"]
        for r in global_shuffle(df, "doc_id", salt="s1").collect()
    }
    expect = _py_order(list(out), "s1")
    assert [k for k, _ in sorted(out.items(), key=lambda kv: kv[1])] == expect
    # dense 0-based positions
    assert sorted(out.values()) == list(range(len(expect)))


def test_global_shuffle_partitioning_invariant(spark):
    a = global_shuffle(_docs(spark, parts=2), "doc_id", salt="x").collect()
    b = global_shuffle(_docs(spark, parts=13), "doc_id", salt="x").collect()
    assert {r["doc_id"]: r["position"] for r in a} == {
        r["doc_id"]: r["position"] for r in b
    }


def test_global_shuffle_shards_balanced_and_modular(spark):
    rows = global_shuffle(
        _docs(spark, n=240), "doc_id", salt="", num_shards=8
    ).collect()
    counts = Counter(r["shard"] for r in rows)
    assert set(counts) == set(range(8))
    assert all(c == 30 for c in counts.values())
    assert all(r["shard"] == r["position"] % 8 for r in rows)


def test_global_shuffle_rejects_bad_bucket_hex(spark):
    with pytest.raises(ValueError):
        global_shuffle(_docs(spark, n=10), "doc_id", bucket_hex=0)


def test_global_shuffle_raises_on_null_key(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2)], "doc_id string, val int"
    )
    with pytest.raises(Exception, match="null key_col"):
        global_shuffle(df, "doc_id").collect()


def _py_tfidf_topk(texts: dict[str, str], k: int):
    tf = {
        d: Counter(t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t)
        for d, txt in texts.items()
    }
    df = Counter(t for c in tf.values() for t in c)
    n = float(len(texts))
    out = {}
    for d, c in tf.items():
        scored = sorted(
            ((tf_v * n / df[t], t, tf_v) for t, tf_v in c.items()),
            key=lambda x: (-x[0], x[1]),
        )
        out[d] = [(t, tf_v, df[t], i + 1) for i, (_, t, tf_v) in enumerate(scored[:k])]
    return out


def test_tfidf_topk_matches_python(spark):
    texts = {
        "d1": "alpha beta beta gamma, gamma gamma!",
        "d2": "alpha alpha delta",
        "d3": "beta delta delta epsilon epsilon epsilon epsilon",
        "d4": "zeta",
        "d5": "",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id string, text string"
    )
    got = {}
    for r in tfidf_topk_terms(df, "doc_id", "text", k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["rk"])
        )
    for d in got:
        got[d].sort(key=lambda x: x[3])
    expect = _py_tfidf_topk(texts, 2)
    # empty doc contributes no rows; every non-empty doc MUST appear
    assert set(got) == {"d1", "d2", "d3", "d4"}
    for d, rows in got.items():
        assert rows == expect[d], d


def test_tfidf_rejects_bad_k(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        tfidf_topk_terms(df, k=0)
