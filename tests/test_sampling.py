"""Deterministic sampling: partitioning-invariance, rate accuracy,
exact-k quotas, salt independence."""

from __future__ import annotations

import hashlib

import pytest

from review_crawler_spark.operators.sampling import (
    rate_threshold,
    sample_exact_k,
    stratified_sample,
)


def _docs(spark, n=400, parts=4):
    rows = [(f"doc{i:04d}", ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, lang string").repartition(
        parts
    )


def _py_hash(key: str, salt: str) -> str:
    return hashlib.md5((key + salt).encode()).hexdigest()[:15]


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "0" * 15
    assert rate_threshold(1.0) == "g"  # sorts above every hex hash
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_stratified_matches_python_reference(spark):
    df = _docs(spark)
    rates = {"en": 0.5, "de": 0.2}
    got = {
        r.doc_id
        for r in stratified_sample(
            df, "lang", rates, "doc_id", default_rate=0.05, salt="s"
        ).collect()
    }
    exp = set()
    for i in range(400):
        doc, lang = f"doc{i:04d}", ["en", "de", "fr"][i % 3]
        if _py_hash(doc, "s") < rate_threshold(rates.get(lang, 0.05)):
            exp.add(doc)
    assert got == exp
    # rates land near target (md5 uniformity at n≈133/stratum)
    n_en = sum(1 for d in exp if int(d[3:]) % 3 == 0)
    assert 0.35 <= n_en / 134 <= 0.65


def test_stratified_invariant_under_partitioning(spark):
    rates = {"en": 0.3}
    a = {
        r.doc_id
        for r in stratified_sample(
            _docs(spark, parts=1), "lang", rates, "doc_id"
        ).collect()
    }
    b = {
        r.doc_id
        for r in stratified_sample(
            _docs(spark, parts=13), "lang", rates, "doc_id"
        ).collect()
    }
    assert a == b


def test_salt_draws_independent_samples(spark):
    df = _docs(spark)
    rates = {"en": 0.5, "de": 0.5, "fr": 0.5}
    a = {
        r.doc_id
        for r in stratified_sample(df, "lang", rates, "doc_id", salt="a").collect()
    }
    b = {
        r.doc_id
        for r in stratified_sample(df, "lang", rates, "doc_id", salt="b").collect()
    }
    assert a != b
    overlap = len(a & b) / max(len(a), 1)
    assert 0.25 <= overlap <= 0.75  # ~independent 50% draws


def test_exact_k_quota_and_determinism(spark):
    df = _docs(spark)
    out = sample_exact_k(df, "lang", 9, "doc_id").collect()
    by_lang: dict[str, set] = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert all(len(v) == 9 for v in by_lang.values())
    again = sample_exact_k(_docs(spark, parts=11), "lang", 9, "doc_id").collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}
    # expected membership: smallest k by (hash, key) per stratum
    for lang, members in by_lang.items():
        pool = sorted(
            (f"doc{i:04d}" for i in range(400)
             if ["en", "de", "fr"][i % 3] == lang),
            key=lambda d: (_py_hash(d, ""), d),
        )
        assert set(pool[:9]) == members


def test_exact_k_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [("a", "xx"), ("b", "xx")], "doc_id string, lang string"
    )
    assert sample_exact_k(df, "lang", 5, "doc_id").count() == 2


def test_exact_k_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        sample_exact_k(_docs(spark, 9), "lang", 0, "doc_id")


def test_exact_k_plan_uses_window_group_limit(spark):
    # at 100 TB a per-stratum window with 5 strata is 5 tasks UNLESS the
    # rank<=k filter pushes a partial group-limit below the shuffle —
    # Spark's WindowGroupLimit does exactly that; pin it so a refactor
    # (e.g. filtering on a derived column) can't silently lose it
    df = _docs(spark, 50)
    plan = (
        sample_exact_k(df, "lang", 3, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("WindowGroupLimit") >= 2, plan  # Partial + Final
