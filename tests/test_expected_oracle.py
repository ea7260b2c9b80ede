"""Parity tests for the pure-Python oracle behind the three non-SQL queries.

tools/gen_expected.py reimplements XXH64 / FNV-1a / hyperplane-LSH from the
public specs; these tests pin its Spark-exactness so the generated
expected_pairs.json stays a trustworthy driver oracle. Also pins the
PySpark-4 sibling-lambda regression that silently degenerated the round-1
minhash signature (all 32 lanes collapsed to one value).
"""

import struct
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from gen_expected import (  # noqa: E402
    normalize,
    round_half_up,
    shingles,
    spark_xxhash64,
    xxh64,
)

SAMPLES = [
    "hello world",
    "",
    "a",
    "The quick; brown-fox! Jumps\tover   the lazy dog 42",
    "x" * 100,
    "doc 17 body text words",
    "exactly-thirty-one-bytes-here!!",
    "exactly-thirty-two-bytes-here!!!",
    "a much longer string that exceeds the thirty-two byte stripe threshold of xxh64",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(7)).alias("h2"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r.s) == r.h1
        assert spark_xxhash64(r.s, ("int", 7)) == r.h2


def test_xxh64_long_chain_matches_spark(spark):
    got = spark.range(1).select(
        F.xxhash64(
            F.lit(1234567890123), F.lit(-987654321098), F.lit(7)
        ).alias("h")
    ).collect()[0].h
    # F.lit(7) is IntegerType (fits int32); the big literals are LongType
    assert spark_xxhash64(1234567890123, -987654321098, ("int", 7)) == got


def test_normalize_and_shingles_match_spark(spark):
    from review_crawler_spark.functions.text import normalize_text, word_shingles

    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    rows = df.select(
        "s",
        normalize_text(F.col("s")).alias("norm"),
        word_shingles(F.col("s"), k=3).alias("sh"),
    ).collect()
    for r in rows:
        assert normalize(r.s) == r.norm
        assert shingles(r.s, 3) == list(r.sh)


def test_round_half_up_matches_spark(spark):
    vals = [0.1234565, 0.1234564999, -0.1234565, 2.5e-7, 0.9999995, 0.291663]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    rows = df.select("v", F.round("v", 6).alias("r")).collect()
    for r in rows:
        assert round_half_up(r.v, 6) == r.r


def test_minhash_lanes_are_independent(spark):
    """Regression: sibling Python-lambda transforms in one F.array collapse
    in PySpark 4 — minhash_signature must produce 32 DISTINCT lane minima."""
    from review_crawler_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    sig = minhash_signature(df).collect()[0].sig
    assert len(set(sig)) > 16, "lanes collapsed — sibling-lambda bug is back"
    # and they equal the pure-Python oracle's lanes
    sh = shingles("alpha beta gamma delta epsilon zeta eta theta iota kappa", 3)
    expected = []
    for i in range(32):
        lane = []
        for s in sh:
            base = xxh64(s.encode(), 42)
            h_long = xxh64(struct.pack("<Q", base), 42)
            v = xxh64(struct.pack("<i", i), h_long)
            lane.append(v - (1 << 64) if v >= (1 << 63) else v)
        expected.append(min(lane))
    assert list(sig) == expected


@pytest.mark.slow
def test_expected_pairs_match_spark_at_sf0001(spark):
    """Full-query equality: Spark output == generated expectation at sf0.001."""
    import json

    import __spark_entry__ as em

    with open("/root/repo/expected/expected_pairs.json") as fh:
        exp = json.load(fh)
    qs = em.queries()
    sf = "/root/testdata/sf0.001"
    for name in [
        "minhash_lsh_pairs", "simhash_pairs", "ann_topk_lsh", "dedup_clusters"
    ]:
        srows = sorted(tuple(r) for r in qs[name](spark, sf).collect())
        block = exp[name][0]
        erows = sorted(tuple(r) for r in block["rows"])
        assert srows == erows, f"{name} diverged from pure-Python oracle"
