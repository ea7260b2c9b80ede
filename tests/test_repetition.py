"""Gopher-style repetition counters vs an independent Python reference."""

from __future__ import annotations

from collections import Counter

from review_crawler_spark.functions.text import repetition_stats


def _expected(text: str) -> tuple[int, int, int, int, int]:
    toks = text.split(" ")
    uni = Counter(toks)
    big = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    tri = Counter(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))
    return (
        sum(uni.values()),
        max(uni.values()),
        max(big.values()) if big else 0,
        sum(c for c in tri.values() if c > 1),
        sum(tri.values()),
    )


def test_repetition_stats_vs_python(spark):
    docs = [
        ("clean", "the quick brown fox jumps over the lazy dog"),
        ("spam", "buy now buy now buy now buy now buy now"),
        ("boiler", "a b c a b c a b c a b c"),
        ("single", "word"),
        ("pair", "two tokens"),
        ("tri", "x y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: (
            r.n_tokens, r.top_unigram, r.top_bigram, r.dup_trigram_pos,
            r.n_trigrams,
        )
        for r in repetition_stats(df).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _expected(text), doc_id
    # the spam doc is exactly what the filter exists to catch
    n, top_u, top_b, dup, n_tri = got["spam"]
    assert top_u / n >= 0.5 and dup == n_tri


def test_repetition_stats_short_docs_no_grams(spark):
    df = spark.createDataFrame(
        [("one", "solo"), ("two", "a b")], "doc_id string, text string"
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows["one"].top_bigram == 0 and rows["one"].n_trigrams == 0
    assert rows["two"].top_bigram == 1 and rows["two"].n_trigrams == 0
