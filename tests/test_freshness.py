"""Change-rate recrawl prioritization vs a pure-Python reference:
staleness ordering, single-observation pages sort last, duplicate
timestamps stay deterministic, top-k contract."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from review_crawler_spark.operators.freshness import change_rate_priorities

T0 = datetime(2024, 1, 1)


def _t(h: float) -> datetime:
    return T0 + timedelta(hours=h)


def _obs(spark):
    rows = [
        # fast-changing, fetched long ago → most stale
        ("a", _t(0), "s1"), ("a", _t(1), "s2"), ("a", _t(2), "s3"),
        # same change rate, fetched recently → less stale
        ("b", _t(0), "x1"), ("b", _t(1), "x2"), ("b", _t(50), "x3"),
        # never changes → score 0
        ("c", _t(0), "k"), ("c", _t(10), "k"),
        # single observation → no rate estimate → last
        ("d", _t(5), "q"),
        # duplicate timestamps: ordered by (ts, signal), deterministic
        ("e", _t(0), "m1"), ("e", _t(0), "m2"), ("e", _t(40), "m3"),
    ]
    return spark.createDataFrame(
        rows, "page string, ts timestamp, sig string"
    ).repartition(5)


def _py_rank(rows, k):
    from collections import defaultdict

    by = defaultdict(list)
    for p, t, s in rows:
        by[p].append((t, s))
    now = max(t for _, t, _ in rows)
    scored = []
    for p, obs in by.items():
        obs.sort()
        chg = sum(1 for i in range(1, len(obs)) if obs[i][1] != obs[i - 1][1])
        f, l = obs[0][0], obs[-1][0]
        score = (
            chg * (now - l).total_seconds() / (l - f).total_seconds()
            if l > f else None
        )
        scored.append((p, len(obs), chg, score))
    scored.sort(key=lambda r: (r[3] is None, -(r[3] or 0), r[0]))
    return [(p, n, c, i + 1) for i, (p, n, c, _) in enumerate(scored[:k])]


def test_staleness_ranking_matches_python(spark):
    df = _obs(spark)
    rows = [(r["page"], r["ts"], r["sig"]) for r in df.collect()]
    got = [
        (r["page"], r["n_obs"], r["n_changes"], r["rk"])
        for r in change_rate_priorities(df, "page", "ts", "sig", top_k=10)
        .orderBy("rk").collect()
    ]
    assert got == _py_rank(rows, 10)
    # semantic spot-checks: a (stale + fast) outranks b (recent), which
    # outranks never-changing c; single-obs d is last
    order = [g[0] for g in got]
    assert order.index("a") < order.index("b") < order.index("c")
    assert order[-1] == "d"


def test_top_k_truncates(spark):
    df = _obs(spark)
    out = change_rate_priorities(df, "page", "ts", "sig", top_k=2).collect()
    assert sorted(r["rk"] for r in out) == [1, 2]


def test_rejects_bad_top_k(spark):
    with pytest.raises(ValueError):
        change_rate_priorities(_obs(spark), "page", "ts", "sig", top_k=0)
