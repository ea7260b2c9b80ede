"""Streaming admission + windowed metrics (Structured Streaming wrappers)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from review_crawler_spark.streaming.stream import admit_stream, host_rate_metrics

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts timestamp, priority long, depth int, seq long"
    )


def test_admit_stream_dedups_across_batches(spark, tmp_path):
    inp = tmp_path / "in"
    seen = tmp_path / "seen"
    admitted = tmp_path / "admitted"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()

    # batch 1: three urls (one duplicated modulo canonicalization)
    _batch(
        spark,
        [
            ("https://a.com/x", T0, 5, 1, 1),
            ("HTTPS://A.com/x#frag", T0, 5, 1, 2),
            ("https://b.com/y", T0, 3, 1, 3),
        ],
    ).write.mode("overwrite").parquet(str(inp / "b1"))
    q = admit_stream(spark, str(inp) + "/*", str(seen), str(admitted), str(ckpt))
    q.awaitTermination(120)

    out1 = spark.read.parquet(str(admitted) + "/epoch=*")
    urls1 = {r["canonical_url"] for r in out1.collect()}
    assert urls1 == {"https://a.com/x", "https://b.com/y"}

    # batch 2: one repeat (must be dropped vs url_seen), one new
    _batch(
        spark,
        [
            ("https://a.com/x", T0, 5, 1, 4),
            ("https://c.com/z", T0, 9, 1, 5),
        ],
    ).write.mode("overwrite").parquet(str(inp / "b2"))
    q2 = admit_stream(spark, str(inp) + "/*", str(seen), str(admitted), str(ckpt))
    q2.awaitTermination(120)

    out = spark.read.parquet(str(admitted) + "/epoch=*")
    urls = {r["canonical_url"] for r in out.collect()}
    assert urls == {"https://a.com/x", "https://b.com/y", "https://c.com/z"}
    assert out.count() == 3  # the repeat was deduped, not re-admitted


def test_host_rate_metrics_stream(spark, tmp_path):
    inp = tmp_path / "in2"
    inp.mkdir()
    rows = [
        (f"https://h{i % 2}.com/p{i}", T0 + dt.timedelta(minutes=i), 1, 1, i)
        for i in range(10)
    ]
    _batch(spark, rows).write.mode("overwrite").parquet(str(inp / "b1"))

    stream = spark.readStream.schema(
        "url string, ts timestamp, priority long, depth int, seq long"
    ).parquet(str(inp) + "/*")
    agg = host_rate_metrics(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rates").collect()
    # append mode emits only watermark-finalized windows; with a 10-row
    # bounded input the final windows stay open — accept either, but the
    # query itself must run and the schema must hold
    assert {c for c in spark.sql("SELECT * FROM rates").columns} == {
        "win_start", "host", "n_urls", "n_unique"
    }
    # complete-mode cross-check for the same aggregation semantics
    static = host_rate_metrics(spark.read.parquet(str(inp) + "/b1"))
    rows = {(r["host"], r["n_urls"]) for r in static.collect()}
    assert sum(n for _, n in rows) == 10


def test_rate_limited_schedule_stateful(spark, tmp_path):
    """Token-bucket politeness across micro-batches: batch 1 exhausts the
    budget; a sparse batch 2 accrues carryover; batch 3 may burst."""
    from review_crawler_spark.streaming.stream import rate_limited_schedule

    inp = tmp_path / "in3"
    ckpt = tmp_path / "ckpt3"
    inp.mkdir()

    def write_batch(name, n_urls, host="h1.com"):
        rows = [
            (f"https://{host}/p{name}-{i}", T0, 100 - i, 1, i)
            for i in range(n_urls)
        ]
        _batch(spark, rows).write.mode("overwrite").parquet(str(inp / name))

    out_dir = tmp_path / "sched_out"
    stream = spark.readStream.schema(
        "url string, ts timestamp, priority long, depth int, seq long"
    ).parquet(str(inp) + "/*")

    def run_once():
        q = (
            rate_limited_schedule(stream, budget_per_batch=8, carryover_cap=16)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out_dir)).collect()

    # batch 1: 20 urls, budget 8 → 8 granted, carry 0
    write_batch("b1", 20)
    rows = run_once()
    assert len(rows) == 8
    # highest priority first
    assert sorted(r["priority"] for r in rows) == list(range(93, 101))

    # batch 2: 3 urls → all granted, carry 5
    write_batch("b2", 3)
    rows = run_once()
    assert len(rows) == 8 + 3

    # batch 3: 20 urls → 8 + 5 carryover = 13 granted
    write_batch("b3", 20)
    rows = run_once()
    assert len(rows) == 8 + 3 + 13


def test_admit_batch_epoch_replay_exactly_once(spark, tmp_path):
    """Round-1 ADVICE (medium): a batch that completed both the admitted and
    url_seen writes but crashed before the streaming checkpoint commits is
    REPLAYED by Structured Streaming. The replay must reproduce the same
    admitted output — not anti-join against its own url_seen partition and
    overwrite admitted/epoch=N with an empty dataset."""
    from review_crawler_spark.streaming.stream import admit_batch

    seen = tmp_path / "seen"
    admitted = tmp_path / "admitted"

    b1 = _batch(
        spark,
        [("https://a.com/x", T0, 5, 1, 1), ("https://b.com/y", T0, 3, 1, 2)],
    )
    admit_batch(b1, 0, str(seen), str(admitted))
    b2 = _batch(
        spark,
        [("https://a.com/x", T0, 5, 1, 3), ("https://c.com/z", T0, 9, 1, 4)],
    )
    admit_batch(b2, 1, str(seen), str(admitted))
    out = spark.read.parquet(str(admitted) + "/epoch=*")
    assert {r["canonical_url"] for r in out.collect()} == {
        "https://a.com/x", "https://b.com/y", "https://c.com/z",
    }

    # crash-replay of epoch 1: url_seen/epoch=1 already exists
    admit_batch(b2, 1, str(seen), str(admitted))
    replay = spark.read.parquet(str(admitted) + "/epoch=1")
    assert {r["canonical_url"] for r in replay.collect()} == {"https://c.com/z"}
    out = spark.read.parquet(str(admitted) + "/epoch=*")
    assert out.count() == 3  # exactly-once across the replay


def test_archive_stream_warc_round_trip(spark, tmp_path):
    from review_crawler_spark.sources.warc import read_warc
    from review_crawler_spark.streaming.stream import (
        PAYLOAD_STREAM_SCHEMA,
        archive_stream,
    )

    inp = tmp_path / "payloads"
    arch = tmp_path / "warc"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()
    rows = [
        (f"https://a.com/p/{i}", T0, "text/html", b"<html>\r\n\r\n\x00" + bytes([i]) * i)
        for i in range(12)
    ]
    spark.createDataFrame(rows, PAYLOAD_STREAM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(inp / "drop1"))

    q = archive_stream(spark, str(inp) + "/*", str(arch), str(ckpt))
    q.awaitTermination(120)

    back = read_warc(spark, f"{arch}/epoch=*/*.warc.gz")
    got = {r["url"]: bytes(r["payload"]) for r in back.collect()}
    assert got == {u: p for u, _, _, p in rows}
    assert all(
        r["date"] == "2024-01-01T12:00:00Z" for r in back.collect()
    )


def test_archive_batch_epoch_replay_exactly_once(spark, tmp_path):
    from review_crawler_spark.sources.warc import read_warc
    from review_crawler_spark.streaming.stream import (
        PAYLOAD_STREAM_SCHEMA,
        archive_batch,
    )

    arch = tmp_path / "warc"
    rows = [
        (f"https://a.com/p/{i}", T0, "text/html", b"x" * (i + 1))
        for i in range(8)
    ]
    batch8 = spark.createDataFrame(rows, PAYLOAD_STREAM_SCHEMA).repartition(4)
    archive_batch(batch8, 7, str(arch))
    # replay the SAME epoch with fewer rows AND fewer partitions (the
    # post-crash replan case) — stale trailing segments must not survive
    batch3 = spark.createDataFrame(rows[:3], PAYLOAD_STREAM_SCHEMA).coalesce(1)
    archive_batch(batch3, 7, str(arch))
    back = read_warc(spark, f"{arch}/epoch=*/*.warc.gz")
    assert back.count() == 3
