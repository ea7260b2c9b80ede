"""Cuckoo-filter shard properties (the deletable URL-seen prefilter).

Contracts mirrored from test_bloom.py — zero false negatives, bounded FPP,
int64 hash integrity — plus the cuckoo-specific ones: deletion removes
exactly the deleted keys, high-load insertion still places every key via
the eviction walk, and the numpy kernels agree with a dict-based
pure-Python expectation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from review_crawler_spark.crawler import cuckoo
from review_crawler_spark.crawler.cuckoo import (
    SLOTS, _buckets_of, _contains, _delete, _fp_i1, _i2, _insert_batch,
)

BITS = cuckoo.SHARD_BITS_DEFAULT


# ---------------------------------------------------------- kernel units

def test_insert_probe_kernel_exhaustive():
    m = _buckets_of(BITS)
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    _insert_batch(table, keys, m)
    assert _contains(table, keys, m).all(), "inserted key probed negative"

    other = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    fpp = _contains(table, other, m).mean()
    # theory: 2·SLOTS/2^16 ≈ 0.012% — allow 10x headroom
    assert fpp < 0.002, f"FPP too high: {fpp}"


def test_kernel_matches_pure_python_multiset():
    """The table must hold exactly the multiset of (bucket-pair, fp) the
    textbook algorithm would: count every stored fingerprint and compare
    against a dict-of-multisets expectation keyed by canonical bucket."""
    m = _buckets_of(BITS)
    rng = np.random.default_rng(13)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    _insert_batch(table, keys, m)

    fp, i1 = _fp_i1(keys, m)
    i2 = _i2(i1, fp, m)
    expected: dict[tuple[int, int], int] = {}
    for f, a, b in zip(fp, i1, i2):
        expected[(min(a, b), int(f))] = expected.get((min(a, b), int(f)), 0) + 1

    got: dict[tuple[int, int], int] = {}
    for bkt in np.flatnonzero((table != 0).any(axis=1)):
        for f in table[bkt][table[bkt] != 0]:
            alt = int(_i2(np.array([bkt]), np.array([f], np.uint16), m)[0])
            got[(min(int(bkt), alt), int(f))] = (
                got.get((min(int(bkt), alt), int(f)), 0) + 1
            )
    assert got == expected


def test_delete_kernel_removes_only_deleted():
    m = _buckets_of(BITS)
    rng = np.random.default_rng(23)
    keys = rng.integers(-(2**62), 2**62, size=30_000, dtype=np.int64)
    keys = np.unique(keys)
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    _insert_batch(table, keys, m)
    gone, kept = keys[::2], keys[1::2]
    removed = _delete(table, gone, m)
    assert removed.all(), "every inserted key must be deletable"
    assert _contains(table, kept, m).all(), "delete evicted a kept key"
    # deleted keys may still false-positive via an unrelated colliding
    # fingerprint, but only at the filter's FPP — not systematically
    assert _contains(table, gone, m).mean() < 0.002


def test_eviction_walk_at_high_load():
    """Fill a tiny table to ~90% load — far past what the free-slot waves
    alone can place — and require the eviction walk to finish the job."""
    bits = 1 << 13  # 128 buckets x 4 slots = 512 capacity
    m = _buckets_of(bits)
    rng = np.random.default_rng(31)
    keys = rng.integers(-(2**62), 2**62, size=460, dtype=np.int64)
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    _insert_batch(table, keys, m)
    assert _contains(table, keys, m).all()
    load = (table != 0).mean()
    assert load > 0.85


# ----------------------------------------------------------- Spark layer

def test_spark_zero_false_negatives_and_fpp(spark):
    n = 20_000
    seen = spark.range(n).select(F.xxhash64("id").alias("url_hash"))
    shards = cuckoo.build_shards(seen, num_shards=8)
    probed_in = cuckoo.probe(seen.select("url_hash"), shards, num_shards=8)
    assert probed_in.filter(~F.col("maybe_seen")).count() == 0

    fresh = spark.range(n, 2 * n).select(F.xxhash64("id").alias("url_hash"))
    probed_out = cuckoo.probe(fresh.select("url_hash"), shards, num_shards=8)
    fp = probed_out.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.002, f"FPP too high: {fp}/{n}"


def test_spark_incremental_update_probe_equivalent(spark):
    """update_shards(old, delta) must probe-match a fresh build over the
    union. (Unlike the bloom, cuckoo tables are NOT bit-identical across
    insert orders — slot placement is order-dependent — so the contract
    is membership equivalence, which is what admission consumes.)"""
    a = spark.range(0, 5_000).select(F.xxhash64("id").alias("url_hash"))
    b = spark.range(5_000, 9_000).select(F.xxhash64("id").alias("url_hash"))
    incr = cuckoo.update_shards(cuckoo.build_shards(a, 8), b, 8)
    both = a.unionByName(b)
    assert cuckoo.probe(both, incr, 8).filter(~F.col("maybe_seen")).count() == 0

    out = spark.range(9_000, 18_000).select(F.xxhash64("id").alias("url_hash"))
    fp = cuckoo.probe(out, incr, 8).filter(F.col("maybe_seen")).count()
    assert fp / 9_000 < 0.002


def test_spark_delete_reopens_urls(spark):
    """The recrawl/TTL story end-to-end: delete expired keys from the
    shards and they probe unseen again, while every live key stays put.
    Untouched shards must pass through byte-identical."""
    seen = spark.range(16_000).select(F.xxhash64("id").alias("url_hash"))
    shards = cuckoo.build_shards(seen, num_shards=8).cache()
    # expire only keys living in shards 0 and 1 → shards 2..7 untouched
    expired = seen.filter(
        cuckoo.shard_of(F.col("url_hash"), 8) < 2
    ).limit(500).cache()
    after = cuckoo.delete_keys(shards, expired, num_shards=8).cache()

    gone = cuckoo.probe(expired, after, 8).filter(F.col("maybe_seen")).count()
    assert gone / 500 < 0.01, "expired keys must probe unseen"
    live = seen.join(expired, "url_hash", "left_anti")
    assert cuckoo.probe(live, after, 8).filter(~F.col("maybe_seen")).count() == 0

    before_b = {r["shard_id"]: bytes(r["bits"]) for r in shards.collect()}
    after_b = {r["shard_id"]: bytes(r["bits"]) for r in after.collect()}
    assert set(after_b) == set(before_b)
    for sid in range(2, 8):
        assert after_b[sid] == before_b[sid], f"untouched shard {sid} rewritten"
    shards.unpersist(); expired.unpersist(); after.unpersist()


def test_extreme_hashes_survive_arrow(spark):
    vals = [(2**62 + 1,), (-(2**62) - 7,), (2**53 + 1,), (1,)]
    seen = spark.createDataFrame(vals, "url_hash long")
    shards = cuckoo.build_shards(seen, num_shards=2)
    probed = cuckoo.probe(seen, shards, num_shards=2)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
