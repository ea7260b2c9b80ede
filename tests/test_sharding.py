"""Output-stage sharding: size balance, partitioning invariance,
aspect-bucket batch geometry."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.operators.sharding import (
    ASPECT_LADDER,
    ASPECT_NAMES,
    image_aspect_batches,
    shard_assign,
    with_train_order,
)

TARGET = 4096


def _docs(spark, n=300, parts=4):
    rows = [
        (f"doc{i:04d}", "x" * (40 + (i * 37) % 500)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").repartition(
        parts
    )


def _py_order(key: str, salt: str = "") -> str:
    return hashlib.md5((key + salt).encode()).hexdigest()[:15]


def test_shard_assign_matches_python_reference(spark):
    df = _docs(spark).withColumn("sz", F.length("text"))
    got = {
        r.doc_id: r.shard_id
        for r in shard_assign(df, "doc_id", "sz", TARGET).collect()
    }
    rows = sorted(
        ((_py_order(d), d, len(t)) for d, t in
         ((r.doc_id, r.text) for r in df.collect())),
    )
    cum = 0
    for ok, doc_id, sz in rows:
        assert got[doc_id] == cum // TARGET, doc_id
        cum += sz


def test_shard_sizes_balanced(spark):
    df = _docs(spark).withColumn("sz", F.length("text"))
    sums = {
        r.shard_id: r.s
        for r in shard_assign(df, "doc_id", "sz", TARGET)
        .groupBy("shard_id")
        .agg(F.sum("sz").alias("s"))
        .collect()
    }
    max_sz = 540  # generator bound
    last = max(sums)
    assert sorted(sums) == list(range(last + 1))  # contiguous ids
    for sid, s in sums.items():
        if sid != last:
            # greedy fill: a shard closes only once it crosses its
            # boundary, and overshoots by less than one row
            assert TARGET - max_sz < s < TARGET + max_sz, (sid, s)


def test_shard_assign_partitioning_invariant(spark):
    df = _docs(spark).withColumn("sz", F.length("text"))
    a = {
        (r.doc_id, r.shard_id)
        for r in shard_assign(df.repartition(2), "doc_id", "sz", TARGET).collect()
    }
    b = {
        (r.doc_id, r.shard_id)
        for r in shard_assign(df.repartition(13), "doc_id", "sz", TARGET).collect()
    }
    assert a == b


def test_shard_assign_rejects_bad_target(spark):
    df = _docs(spark, n=5).withColumn("sz", F.length("text"))
    with pytest.raises(ValueError):
        shard_assign(df, "doc_id", "sz", 0)


def test_train_order_salt_draws_new_permutation(spark):
    df = _docs(spark, n=100)
    a = [r.doc_id for r in with_train_order(df, "doc_id").orderBy(
        "order_key", "doc_id").collect()]
    b = [r.doc_id for r in with_train_order(df, "doc_id", salt="ep1").orderBy(
        "order_key", "doc_id").collect()]
    assert sorted(a) == sorted(b)
    assert a != b


def _frames(spark, n=160, parts=4):
    # every ladder class, including ratios outside the generator's range
    geoms = [(24, 48), (24, 32), (32, 32), (40, 32), (64, 32)]
    rows = [(f"img{i:04d}", *geoms[i % len(geoms)]) for i in range(n)]
    return spark.createDataFrame(rows, "image_id string, w int, h int").repartition(
        parts
    )


def _py_bucket(w: int, h: int) -> str:
    r = w / h
    for cut, name in zip(ASPECT_LADDER, ASPECT_NAMES):
        if r < cut:
            return name
    return ASPECT_NAMES[-1]


def test_aspect_batches_match_python_reference(spark):
    bs = 8
    out = image_aspect_batches(_frames(spark), bs).collect()
    by_bucket: dict[str, list] = {}
    for r in out:
        assert r.bucket == _py_bucket(r.w, r.h)
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == set(ASPECT_NAMES)  # all five classes hit
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: (_py_order(r.image_id), r.image_id))
        for i, r in enumerate(rows):
            assert (r.batch_id, r.slot) == (i // bs, i % bs), (bucket, i)


def test_aspect_batches_full_except_last(spark):
    bs = 8
    out = image_aspect_batches(_frames(spark), bs)
    per = out.groupBy("bucket", "batch_id").count().collect()
    last = {
        r.bucket: r.m
        for r in out.groupBy("bucket").agg(F.max("batch_id").alias("m")).collect()
    }
    for r in per:
        if r.batch_id != last[r.bucket]:
            assert r["count"] == bs, (r.bucket, r.batch_id)
        else:
            assert 1 <= r["count"] <= bs


def test_aspect_batches_partitioning_invariant(spark):
    df = _frames(spark)
    key = ["image_id", "bucket", "batch_id", "slot"]
    a = {tuple(r[k] for k in key)
         for r in image_aspect_batches(df.repartition(3), 8).collect()}
    b = {tuple(r[k] for k in key)
         for r in image_aspect_batches(df.repartition(11), 8).collect()}
    assert a == b


def test_aspect_batches_rejects_bad_size(spark):
    with pytest.raises(ValueError):
        image_aspect_batches(_frames(spark, n=4), 0)
