"""Repeat-and-sample domain mixing: python-reference equality, copy
structure, partitioning invariance, factor edge cases."""

from __future__ import annotations

import hashlib

import pytest

from review_crawler_spark.operators.mixing import upsample_mix
from review_crawler_spark.operators.sampling import rate_threshold

FACTORS = {"en": 0.5, "de": 2.25, "fr": 3.0, "zh": 0.0}


def _docs(spark, n=400, parts=4):
    rows = [
        (f"doc{i:04d}", ["en", "de", "fr", "zh", "es"][i % 5]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string").repartition(
        parts
    )


def _py_hash(key: str, salt: str = "") -> str:
    return hashlib.md5((key + salt).encode()).hexdigest()[:15]


def _py_copies(doc_id: str, lang: str) -> int:
    f = FACTORS.get(lang, 1.0)
    whole = int(f)
    extra = 1 if _py_hash(doc_id) < rate_threshold(f - whole) else 0
    return whole + extra


def test_mix_matches_python_reference(spark):
    got: dict[str, list[int]] = {}
    for r in upsample_mix(_docs(spark), "lang", FACTORS, "doc_id").collect():
        got.setdefault(r.doc_id, []).append(r.copy_id)
    for r in _docs(spark).collect():
        n = _py_copies(r.doc_id, r.lang)
        assert sorted(got.get(r.doc_id, [])) == list(range(n)), r.doc_id


def test_mix_integer_factor_is_exact_repetition(spark):
    out = upsample_mix(_docs(spark), "lang", {"fr": 3.0}, "doc_id",
                       default_factor=0.0)
    per = {r.doc_id for r in out.collect()}
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
    assert all(d.startswith("doc") for d in per)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"fr"}


def test_mix_zero_factor_drops_stratum(spark):
    out = upsample_mix(_docs(spark), "lang", FACTORS, "doc_id")
    assert out.filter("lang = 'zh'").count() == 0
    # default factor 1.0: es kept exactly once
    es = out.filter("lang = 'es'").groupBy("doc_id").count().collect()
    assert len(es) == 80 and all(r["count"] == 1 for r in es)


def test_mix_partitioning_invariant(spark):
    df = _docs(spark)
    a = {(r.doc_id, r.copy_id)
         for r in upsample_mix(df.repartition(2), "lang", FACTORS,
                               "doc_id").collect()}
    b = {(r.doc_id, r.copy_id)
         for r in upsample_mix(df.repartition(13), "lang", FACTORS,
                               "doc_id").collect()}
    assert a == b


def test_mix_rejects_bad_factor(spark):
    with pytest.raises(ValueError):
        upsample_mix(_docs(spark, n=5), "lang", {"en": -1.0}, "doc_id")
    with pytest.raises(ValueError):
        upsample_mix(_docs(spark, n=5), "lang", {"en": float("inf")}, "doc_id")
