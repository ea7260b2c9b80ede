"""Host-level quality gating (operators/host_quality.py) vs a pure-Python
reference, plus the broadcast-filter semantics and integer-exact verdicts."""

from __future__ import annotations

from review_crawler_spark.operators.host_quality import (
    host_quality_filter,
    host_quality_stats,
)

# good.com: 3 long docs — passes both gates.
# shorty.net: 2 of 3 docs short (67% > 8%) — fails the short-share gate.
# thin.org: no short docs but mean 30 tokens < 48 — fails the mean gate.
DOCS = [
    (1, "good.com", "alpha " * 60),
    (2, "good.com", "beta " * 50),
    (3, "good.com", "gamma " * 55),
    (4, "shorty.net", "tiny doc"),
    (5, "shorty.net", "another tiny"),
    (6, "shorty.net", "longer " * 40),
    (7, "thin.org", "mid " * 30),
    (8, "thin.org", "mid " * 30),
]


def _reference(rows, short=20, max_pct=8, min_avg=48):
    agg = {}
    for _, host, text in rows:
        t = len(text.split())
        n, s, sh = agg.get(host, (0, 0, 0))
        agg[host] = (n + 1, s + t, sh + (1 if t < short else 0))
    return {
        h: (n, s, sh, int(sh * 100 <= n * max_pct and s >= n * min_avg))
        for h, (n, s, sh) in agg.items()
    }


def test_stats_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    got = {
        r["host"]: (r["n_docs"], r["n_tokens"], r["n_short"], r["keep_host"])
        for r in host_quality_stats(docs).collect()
    }
    assert got == _reference(DOCS)
    assert got["good.com"][3] == 1
    assert got["shorty.net"][3] == 0  # short-share gate
    assert got["thin.org"][3] == 0  # mean-length gate


def test_filter_keeps_only_passing_hosts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    kept = host_quality_filter(docs).select("doc_id", "source").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3]
    assert {r["source"] for r in kept} == {"good.com"}


def test_filter_annotates_host_aggregates(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    row = host_quality_filter(docs).filter("doc_id = 1").collect()[0]
    assert (row["n_docs"], row["n_short"]) == (3, 0)


def test_thresholds_are_parameters(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    # loosen both gates -> every host passes
    kept = host_quality_filter(
        docs, max_short_pct=100, min_avg_tokens=0
    ).count()
    assert kept == len(DOCS)


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(
        DOCS * 5, "doc_id long, source string, text string"
    )
    a = sorted(map(tuple, host_quality_stats(docs).collect()))
    b = sorted(map(tuple, host_quality_stats(docs.repartition(7)).collect()))
    assert a == b


def test_verdict_dim_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    plan = host_quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the corpus side never shuffles
