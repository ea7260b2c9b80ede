"""As-of join and range join vs pure-Python references, plus edge and
error cases (no prior match, equal-timestamp inclusivity, interval
spans crossing many buckets, column-collision guards)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from review_crawler_spark.operators.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1)


def _t(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


def _left(spark):
    rows = [
        (1, "h1", _t(5)),
        (2, "h1", _t(10)),
        (3, "h1", _t(30)),
        (4, "h2", _t(7)),
        (5, "h2", _t(2)),   # before any right row for h2
        (6, "h3", _t(50)),  # key with no right rows at all
    ]
    return spark.createDataFrame(rows, "id long, host string, ts timestamp")


def _right(spark):
    rows = [
        ("h1", _t(0), 100),
        ("h1", _t(10), 110),   # equal ts with left id=2 → inclusive match
        ("h1", _t(20), 120),
        ("h2", _t(4), 200),
    ]
    return spark.createDataFrame(rows, "host string, rts timestamp, snap long")


def test_asof_backward_inclusive(spark):
    out = {
        r["id"]: r["snap"]
        for r in asof_join(
            _left(spark), _right(spark), ["host"], "ts", "rts", ["snap"]
        ).collect()
    }
    assert out == {1: 100, 2: 110, 3: 120, 4: 200, 5: None, 6: None}


def test_asof_partitioning_invariant(spark):
    a = asof_join(
        _left(spark).repartition(1), _right(spark).repartition(5),
        ["host"], "ts", "rts", ["snap"],
    ).collect()
    b = asof_join(
        _left(spark).repartition(7), _right(spark).repartition(2),
        ["host"], "ts", "rts", ["snap"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_asof_null_payload_row_still_wins(spark):
    """A matching right row whose payload field is NULL must yield NULL —
    not leak the previous row's value (per-column carry-forward bug)."""
    left = spark.createDataFrame(
        [(1, "h1", _t(15))], "id long, host string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("h1", _t(0), 100), ("h1", _t(10), None)],
        "host string, rts timestamp, snap long",
    )
    out = asof_join(left, right, ["host"], "ts", "rts", ["snap"]).collect()
    assert out[0]["snap"] is None


def test_asof_multi_payload_same_row(spark):
    """All payload columns must come from the SAME right row even when
    some of its fields are null."""
    left = spark.createDataFrame(
        [(1, "h1", _t(15))], "id long, host string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("h1", _t(0), 100, "a"), ("h1", _t(10), None, "b")],
        "host string, rts timestamp, snap long, tag string",
    )
    row = asof_join(
        left, right, ["host"], "ts", "rts", ["snap", "tag"]
    ).collect()[0]
    assert (row["snap"], row["tag"]) == (None, "b")


def test_asof_null_right_ts_and_null_keys_never_match(spark):
    """SQL as-of semantics: NULL right timestamps and NULL keys satisfy
    no comparison — a NULL-ts right row must not leak its payload, and
    NULL-key left rows must come back payload-NULL."""
    left = spark.createDataFrame(
        [(1, "h1", _t(15)), (2, None, _t(15))],
        "id long, host string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("h1", None, 100), (None, _t(0), 200), ("h1", _t(3), 300)],
        "host string, rts timestamp, snap long",
    )
    out = {
        r["id"]: r["snap"]
        for r in asof_join(
            left, right, ["host"], "ts", "rts", ["snap"]
        ).collect()
    }
    assert out == {1: 300, 2: None}


def test_asof_rejects_payload_collision(spark):
    with pytest.raises(ValueError):
        asof_join(
            _left(spark), _right(spark).withColumnRenamed("snap", "ts"),
            ["host"], "ts", "rts", ["ts"],
        )


def _py_range(points, ivals):
    return sorted(
        (iid, pid)
        for iid, k, s, e in ivals
        for pid, pk, t in points
        if pk == k and s <= t < e
    )


def test_range_join_matches_python_across_bucket_sizes(spark):
    ivals = [
        (10, "h1", _t(0), _t(25)),     # spans many 60 s buckets
        (11, "h1", _t(30), _t(31)),
        (12, "h2", _t(5), _t(6)),
    ]
    points = [
        (1, "h1", _t(0)),      # == start → included
        (2, "h1", _t(24.99)),
        (3, "h1", _t(25)),     # == end → excluded
        (4, "h1", _t(30.5)),
        (5, "h2", _t(5.5)),
        (6, "h2", _t(40)),
    ]
    idf = spark.createDataFrame(
        ivals, "iid long, host string, s timestamp, e timestamp"
    )
    pdf = spark.createDataFrame(points, "pid long, host string, ts timestamp")
    expect = _py_range(points, ivals)
    for bucket in (60, 600, 3600):
        got = sorted(
            (r["iid"], r["pid"])
            for r in range_join(
                pdf, idf, ["host"], "ts", "s", "e", bucket_seconds=bucket
            ).collect()
        )
        assert got == expect, bucket


def test_asof_randomized_equivalence(spark):
    """Seeded random corpus vs a brute-force Python as-of."""
    import random

    rng = random.Random(0xA50F)
    hosts = [f"h{i}" for i in range(6)]
    left = [
        (i, rng.choice(hosts), _t(rng.uniform(0, 100)))
        for i in range(120)
    ]
    # unique (host, ts) on the right by construction (distinct minutes)
    seen = set()
    right = []
    for j in range(80):
        h, m = rng.choice(hosts), rng.randrange(0, 6000)
        if (h, m) in seen:
            continue
        seen.add((h, m))
        right.append((h, _t(m / 60.0), 1000 + j))
    ldf = spark.createDataFrame(left, "id long, host string, ts timestamp")
    rdf = spark.createDataFrame(
        right, "host string, rts timestamp, snap long"
    )

    def brute(lrow):
        cands = [
            (rt, sn) for h, rt, sn in right
            if h == lrow[1] and rt <= lrow[2]
        ]
        return max(cands)[1] if cands else None

    expect = {i: brute(row) for i, row in ((r[0], r) for r in left)}
    got = {
        r["id"]: r["snap"]
        for r in asof_join(ldf, rdf, ["host"], "ts", "rts", ["snap"])
        .collect()
    }
    assert got == expect


def test_range_join_randomized_equivalence(spark):
    """Seeded random points/intervals vs brute-force containment."""
    import random

    rng = random.Random(0x7A46E)
    hosts = [f"h{i}" for i in range(4)]
    ivals = [
        (i, rng.choice(hosts), _t(s), _t(s + rng.uniform(0.5, 45)))
        for i, s in ((i, rng.uniform(0, 200)) for i in range(60))
    ]
    points = [
        (100 + i, rng.choice(hosts), _t(rng.uniform(0, 250)))
        for i in range(150)
    ]
    idf = spark.createDataFrame(
        ivals, "iid long, host string, s timestamp, e timestamp"
    )
    pdf = spark.createDataFrame(
        points, "pid long, host string, ts timestamp"
    )
    expect = _py_range(points, ivals)
    got = sorted(
        (r["iid"], r["pid"])
        for r in range_join(
            pdf, idf, ["host"], "ts", "s", "e", bucket_seconds=300
        ).collect()
    )
    assert got == expect


def test_range_join_rejects_bad_args(spark):
    idf = spark.createDataFrame(
        [(1, "h", _t(0), _t(1))], "iid long, host string, s timestamp, e timestamp"
    )
    pdf = spark.createDataFrame(
        [(2, "h", _t(0))], "pid long, host string, ts timestamp"
    )
    with pytest.raises(ValueError):
        range_join(pdf, idf, ["host"], "ts", "s", "e", bucket_seconds=0)
    with pytest.raises(ValueError):
        range_join(
            pdf.withColumnRenamed("pid", "iid"), idf,
            ["host"], "ts", "s", "e", bucket_seconds=60,
        )
