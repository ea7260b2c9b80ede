"""Bloom shard properties: zero false negatives (the correctness contract),
sane false-positive rate, and int64 hash integrity through Arrow."""

from __future__ import annotations

from pyspark.sql import functions as F

from review_crawler_spark.crawler import bloom


def test_zero_false_negatives_and_fpp(spark):
    n = 20_000
    seen = spark.range(n).select(F.xxhash64("id").alias("url_hash"))
    shards = bloom.build_shards(seen, num_shards=8)

    # every inserted key must probe positive
    probed_in = bloom.probe(
        seen.select("url_hash"), shards, num_shards=8
    )
    assert probed_in.filter(~F.col("maybe_seen")).count() == 0

    # disjoint keys: false-positive rate stays below 2%
    fresh = spark.range(n, 2 * n).select(F.xxhash64("id").alias("url_hash"))
    probed_out = bloom.probe(fresh.select("url_hash"), shards, num_shards=8)
    fp = probed_out.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.02, f"FPP too high: {fp}/{n}"


def test_incremental_update_equals_rebuild(spark):
    """update_shards(old, delta) must behave exactly like a fresh build over
    the union — same positive probes for every inserted key."""
    a = spark.range(0, 5_000).select(F.xxhash64("id").alias("url_hash"))
    b = spark.range(5_000, 9_000).select(F.xxhash64("id").alias("url_hash"))
    incr = bloom.update_shards(bloom.build_shards(a, 8), b, 8)
    both = a.unionByName(b)
    probed = bloom.probe(both, incr, 8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    rebuilt = bloom.build_shards(both, 8)
    ib = {r["shard_id"]: bytes(r["bits"]) for r in incr.collect()}
    rb = {r["shard_id"]: bytes(r["bits"]) for r in rebuilt.collect()}
    assert ib == rb  # bit-identical, not just probe-equivalent


def test_extreme_hashes_survive_arrow(spark):
    """Hashes beyond 2^53 must not lose precision (regression for the
    float64-upcast bug found during round-1 verification)."""
    vals = [(2**62 + 1,), (-(2**62) - 7,), (2**53 + 1,), (1,)]
    seen = spark.createDataFrame(vals, "url_hash long")
    shards = bloom.build_shards(seen, num_shards=2)
    probed = bloom.probe(seen, shards, num_shards=2)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
