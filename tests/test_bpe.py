"""BPE tokenizer training (operators/bpe.py) — reference equality,
determinism under partitioning, merge-fold semantics, encode/count parity.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from review_crawler_spark.operators.bpe import (
    END,
    bpe_train,
    token_counts,
    word_freq_dim,
)

_PUNCT = re.compile(r"[^\w\s]", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)


def _norm_words(s: str) -> list[str]:
    return [w for w in _WS.sub(" ", _PUNCT.sub("", s.lower())).strip().split(" ") if w]


def _ref_bpe(texts: list[str], num_merges: int):
    """Independent in-test reference (mirrors tools/gen_expected.bpe_expected
    but written against the raw definition, not shared code)."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(_norm_words(t))
    words = {w: list(w) + [END] for w in wf}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        a, b = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, a, b, a + b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words, wf


SENNRICH = (
    "low low low low low lower lower "
    "newest newest newest newest newest newest widest widest widest"
)


def test_sennrich_example(spark):
    """The ACL'16 running example: 'es' (freq 9) merges first, 'low' ends
    fully merged, 'lower' keeps an e-r tail."""
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id INT, text STRING")
    merges, words = bpe_train(docs, num_merges=10)
    got = [(r["rank"], r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    exp, exp_words, _ = _ref_bpe([SENNRICH], 10)
    assert got == [(r, a, b) for r, a, b, _ in exp]
    got_words = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got_words == exp_words
    assert got_words["low"] == ["low" + END]


def test_reference_equality_corpus(spark, sf_dir):
    """Full merge-list + final-encoding equality vs the independent
    reference on real testdata documents (a 120-doc slice keeps the
    pure-Python side fast)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "text")
    )
    rows = docs.orderBy("doc_id").collect()
    merges, words = bpe_train(docs, num_merges=16)
    exp_merges, exp_words, _ = _ref_bpe([r["text"] for r in rows], 16)
    got = [tuple(r) for r in merges.orderBy("rank").collect()]
    assert got == exp_merges
    got_words = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got_words == exp_words


def test_partitioning_invariance(spark):
    """Merges are a pure function of the corpus: 1-partition and 7-partition
    inputs learn the identical vocabulary (argmax tiebreak is total)."""
    texts = [(i, f"alpha beta beta gamma{i % 3} alpha alpha") for i in range(40)]
    docs = spark.createDataFrame(texts, "doc_id INT, text STRING")
    m1, _ = bpe_train(docs.coalesce(1), num_merges=8)
    m7, _ = bpe_train(docs.repartition(7), num_merges=8)
    assert [tuple(r) for r in m1.orderBy("rank").collect()] == [
        tuple(r) for r in m7.orderBy("rank").collect()
    ]


def test_merge_fold_overlapping_run(spark):
    """'aaaa' against pair (a,a) must merge leftmost non-overlapping:
    aa aa — not aa a a or a aa a."""
    docs = spark.createDataFrame([(1, "aaaa aaa")], "doc_id INT, text STRING")
    merges, words = bpe_train(docs, num_merges=1)
    first = merges.collect()[0]
    assert (first["left"], first["right"]) == ("a", "a")
    got = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got["aaaa"] == ["aa", "aa", END]
    assert got["aaa"] == ["aa", "a", END]


def test_token_counts_match_reference(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat"),
        (3, ""),  # empty doc: zero counts, row preserved
        (4, "mat mat mat"),
    ]
    docs = spark.createDataFrame(texts, "doc_id INT, text STRING")
    _, words = bpe_train(docs, num_merges=6)
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in token_counts(docs, words).collect()}
    _, ref_words, _ = _ref_bpe([t for _, t in texts], 6)
    for did, t in texts:
        ws = _norm_words(t)
        assert got[did] == (len(ws), sum(len(ref_words[w]) for w in ws))
    assert got[3] == (0, 0)


def test_word_freq_dim_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, HELLO!! world"), (2, "world")], "doc_id INT, text STRING"
    )
    got = {r["word"]: r["freq"] for r in word_freq_dim(docs).collect()}
    assert got == {"hello": 2, "world": 2}


def test_early_stop_fully_merged(spark):
    """A corpus whose words collapse entirely stops before num_merges."""
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id INT, text STRING")
    merges, words = bpe_train(docs, num_merges=50)
    ranks = [r["rank"] for r in merges.orderBy("rank").collect()]
    assert ranks == [0, 1]  # a+b, ab+</w> — then single symbols, no pairs
    got = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got["ab"] == ["ab" + END]


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"
