"""Bigram-LM perplexity scoring (operators/lm_quality.py) vs a pure-Python
reference — plus the CCNet-shaped property that fluent (high-bigram-reuse)
text scores lower NLL than gibberish, and partitioning-invariance of the
integer score arithmetic."""

from __future__ import annotations

import math
import re
from collections import Counter

from review_crawler_spark.operators.lm_quality import (
    lm_quality_score,
    train_bigram_lm,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat"),
    (3, "the dog sat on the mat"),
    (4, "zq xv qqq plorp zq xv"),
    (5, "one"),  # single token: no bigrams, absent from output
    (6, ""),  # empty: absent from output
    (7, "the cat, sat?? on... the MAT"),  # normalizes to doc 1's text
]


def _norm(t: str) -> list[str]:
    return re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower())).strip().split(" ")


def _reference(corpus, train=None):
    """Pure-Python replay: add-1 bigram LM, integer tenth-milli-nat sums."""
    train = train if train is not None else corpus
    bgs = {
        d: [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        for d, t in corpus
        for w in [_norm(t)]
        if len(w) >= 2
    }
    tbgs = [
        (w[i], w[i + 1])
        for _, t in train
        for w in [_norm(t)]
        if len(w) >= 2
        for i in range(len(w) - 1)
    ]
    c12 = Counter(tbgs)
    c1 = Counter()
    vocab = set()
    for (a, b), c in c12.items():
        c1[a] += c
        vocab.update((a, b))
    v = len(vocab)
    nll = {k: round(math.log((c1[k[0]] + v) / (c12[k] + 1)) * 10000) for k in c12}
    out = {}
    for d, bl in bgs.items():
        known = [b for b in bl if b in nll]
        if not known:
            continue
        s = sum(nll[b] for b in known)
        n = len(known)
        out[d] = (n, s, round(s / 10000.0 / n, 6), math.floor(s / 10000.0 / n))
    return out


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e4"], r["avg_nll"], r["quality_bucket"])
        for r in lm_quality_score(docs).collect()
    }
    assert got == _reference(CORPUS)
    assert 5 not in got and 6 not in got  # <2 tokens → no score row


def test_duplicate_and_normalized_docs_score_identically(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["nll_e4"] for r in lm_quality_score(docs).collect()}
    assert got[1] == got[2] == got[7]  # same normalized text → same score


def test_fluent_scores_below_gibberish(spark):
    # 20 fluent docs reusing the same bigrams + 1 all-unique-bigram doc:
    # reused bigrams have high c12 → low NLL; the gibberish doc's bigrams
    # each occur once → near the add-1 ceiling
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((99, "qq ww ee rr tt yy uu ii oo pp"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in lm_quality_score(docs).collect()}
    assert got[0] < got[99]
    assert all(got[i] == got[0] for i in range(20))


def test_train_score_split_drops_unseen_bigrams(spark):
    train = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "the cat sat zz unseen pair")], "doc_id long, text string"
    )
    row = lm_quality_score(score, train_docs=train).collect()
    # "the cat" / "cat sat" are in the LM; "sat zz" / "zz unseen" /
    # "unseen pair" are not and drop out of the sum
    assert len(row) == 1 and row[0]["n_bigrams"] == 2


def test_partitioning_invariance(spark):
    rows = [(i, f"alpha beta gamma delta {i % 5} beta gamma") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, lm_quality_score(docs).collect()))
    b = sorted(map(tuple, lm_quality_score(docs.repartition(13)).collect()))
    assert a == b  # integer nll sums are order/partitioning independent


def test_lm_dim_shape(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = train_bigram_lm(docs)
    assert lm.columns == ["w1", "w2", "nll_e4"]
    assert dict(lm.dtypes)["nll_e4"] == "bigint"
    # every scored bigram must be in the self-trained LM (inner-join full
    # coverage): "the"→"cat" occurs 3x (docs 1, 2, 7)
    row = {(r["w1"], r["w2"]) for r in lm.collect()}
    assert ("the", "cat") in row
