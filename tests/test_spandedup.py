"""Span-level exact-substring dedup (operators/spandedup.py) vs a
pure-Python reference implementation of the same k-gram-anchor semantics."""

from __future__ import annotations

from review_crawler_spark.operators.spandedup import (
    duplicated_spans,
    strip_duplicated_spans,
)


def _py_spans(docs, k, min_count=2, keep_first=False):
    """Independent reference: dict-of-gram-occurrences, island merge."""
    occ = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[i : i + k]), []).append((doc_id, i))
    marked = {}
    for positions in occ.values():
        if len(positions) < min_count:
            continue
        hits = sorted(positions)[1:] if keep_first else positions
        for doc_id, pos in hits:
            marked.setdefault(doc_id, set()).add(pos)
    spans = []
    for doc_id, poss in marked.items():
        run = []
        for p in sorted(poss):
            if run and p - run[-1] <= k:
                run.append(p)
            else:
                if run:
                    spans.append((doc_id, run[0], run[-1] + k, len(run)))
                run = [p]
        if run:
            spans.append((doc_id, run[0], run[-1] + k, len(run)))
    return sorted(spans)


def _py_strip(docs, k):
    spans = _py_spans(docs, k, keep_first=True)
    by_doc = {}
    for doc_id, s, e, _ in spans:
        by_doc.setdefault(doc_id, []).append((s, e))
    out = []
    for doc_id, text in docs:
        toks = text.split(" ")
        sp = by_doc.get(doc_id, [])
        kept = [t for i, t in enumerate(toks) if not any(s <= i < e for s, e in sp)]
        out.append((doc_id, " ".join(kept), len(sp), len(toks) - len(kept)))
    return sorted(out)


PASSAGE = " ".join(f"p{i}" for i in range(12))  # 12-token planted passage

CORPUS = [
    (0, "a b " + PASSAGE + " c d e f g h"),
    (1, "x y z " + PASSAGE + " q r s"),
    (2, "u v w x y z a b c d e f g h i"),
    (3, PASSAGE + " mid tokens here " + PASSAGE),  # self-repeat
    (4, "lone doc with no duplicated content at all whatsoever"),
    (5, "x y z q r s u v w"),
]


def _spark_docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_spans_match_python_reference(spark):
    got = [
        tuple(r)
        for r in duplicated_spans(_spark_docs(spark, CORPUS), k=5)
        .orderBy("doc_id", "span_start")
        .collect()
    ]
    assert got == _py_spans(CORPUS, k=5)


def test_spans_keep_first_excludes_canonical(spark):
    got = [
        tuple(r)
        for r in duplicated_spans(_spark_docs(spark, CORPUS), k=5, keep_first=True)
        .orderBy("doc_id", "span_start")
        .collect()
    ]
    ref = _py_spans(CORPUS, k=5, keep_first=True)
    assert got == ref
    # doc 0 holds the corpus-first occurrence of the passage: not stripped
    assert all(d != 0 for d, *_ in got)


def test_strip_matches_python_reference(spark):
    got = [
        tuple(r)
        for r in strip_duplicated_spans(_spark_docs(spark, CORPUS), k=5)
        .orderBy("doc_id")
        .collect()
    ]
    assert got == _py_strip(CORPUS, k=5)


def test_strip_preserves_clean_docs(spark):
    rows = {
        r.doc_id: r
        for r in strip_duplicated_spans(_spark_docs(spark, CORPUS), k=5).collect()
    }
    assert rows[4].text_clean == CORPUS[4][1]
    assert rows[4].n_spans == 0 and rows[4].tokens_removed == 0


def test_short_docs_contribute_no_grams(spark):
    docs = [(0, "a b c"), (1, "a b c"), (2, "a b c d e f")]
    # k=5: docs 0/1 are shorter than one gram; doc 2 has grams but no dups
    assert duplicated_spans(_spark_docs(spark, docs), k=5).count() == 0
    got = strip_duplicated_spans(_spark_docs(spark, docs), k=5).orderBy("doc_id").collect()
    assert [r.text_clean for r in got] == ["a b c", "a b c", "a b c d e f"]


def test_partitioning_invariance(spark):
    df = _spark_docs(spark, CORPUS)
    a = duplicated_spans(df.repartition(7), k=5).orderBy("doc_id", "span_start").collect()
    b = duplicated_spans(df.coalesce(1), k=5).orderBy("doc_id", "span_start").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_overlapping_runs_merge_into_one_span(spark):
    # two duplicated 5-gram anchors whose windows overlap (gap <= k) must
    # merge; a gap > k must split.
    base = "w1 w2 w3 w4 w5"
    far = " ".join(f"f{i}" for i in range(9))  # > k filler
    docs = [
        (0, base + " zz " + base + " " + far + " " + base),
        (1, base + " yy " + base + " " + far + " xx " + base),
    ]
    got = _py_spans(docs, k=5)
    spark_got = [
        tuple(r)
        for r in duplicated_spans(_spark_docs(spark, docs), k=5)
        .orderBy("doc_id", "span_start")
        .collect()
    ]
    assert spark_got == got
