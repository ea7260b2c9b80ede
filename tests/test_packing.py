from __future__ import annotations

import random

import pytest

from review_crawler_spark.operators.packing import pack_chunks, prefix_sum


def _df(spark, pairs, parts=None):
    df = spark.createDataFrame(pairs, "doc_id long, n_tokens long")
    return df.repartition(parts) if parts else df


def test_prefix_sum_matches_running_total(spark):
    rng = random.Random(3)
    pairs = [(i, rng.randint(0, 50)) for i in range(500)]
    rng.shuffle(pairs)
    got = {
        r["doc_id"]: r["cum_before"]
        for r in prefix_sum(_df(spark, pairs, parts=13), "doc_id", "n_tokens")
        .collect()
    }
    run = 0
    for i, n in sorted(pairs):
        assert got[i] == run, i
        run += n


def test_prefix_sum_invariant_under_partitioning(spark):
    pairs = [(i, (i * 7) % 23) for i in range(200)]
    a = prefix_sum(_df(spark, pairs, parts=2), "doc_id", "n_tokens")
    b = prefix_sum(
        _df(spark, pairs, parts=17), "doc_id", "n_tokens", num_partitions=5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _reference_chunks(pairs, cap):
    rows = []
    cum = 0
    for doc_id, n in sorted(pairs):
        if n == 0:
            continue
        for chunk in range(cum // cap, (cum + n - 1) // cap + 1):
            rows.append(
                (
                    chunk,
                    doc_id,
                    max(0, chunk * cap - cum),
                    min(n, (chunk + 1) * cap - cum),
                )
            )
        cum += n
    return sorted(rows)


def test_pack_chunks_exact_vs_reference(spark):
    rng = random.Random(9)
    pairs = [(i, rng.randint(0, 40)) for i in range(300)]
    cap = 64
    got = sorted(
        map(tuple, pack_chunks(_df(spark, pairs, parts=11), cap).collect())
    )
    assert got == _reference_chunks(pairs, cap)


def test_every_chunk_full_except_last(spark):
    pairs = [(i, 10 + (i % 5)) for i in range(100)]
    cap = 37
    rows = pack_chunks(_df(spark, pairs), cap).collect()
    total = sum(n for _, n in pairs)
    per_chunk: dict[int, int] = {}
    for r in rows:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    last = max(per_chunk)
    assert set(per_chunk) == set(range(last + 1))
    for c, filled in per_chunk.items():
        assert filled == (cap if c < last else total - cap * last), c


def test_doc_spanning_many_chunks(spark):
    # one huge doc straddles several windows
    pairs = [(0, 5), (1, 200), (2, 3)]
    cap = 50
    got = sorted(map(tuple, pack_chunks(_df(spark, pairs), cap).collect()))
    assert got == _reference_chunks(pairs, cap)
    doc1 = [g for g in got if g[1] == 1]
    assert len(doc1) == 5  # tokens 5..205 -> chunks 0..4
    assert sum(e - s for _, _, s, e in doc1) == 200


def test_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        pack_chunks(_df(spark, [(0, 1)]), 0)
