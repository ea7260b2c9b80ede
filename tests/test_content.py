"""Main-content extraction (functions/content.py) vs a pure-Python
reference classifier, plus generator-targeted expectations."""

from __future__ import annotations

import re

from pyspark.sql import Row

from review_crawler_spark.functions.content import (
    BLOCK_SPLIT_PATTERN,
    extract_main_content,
    main_content_blocks,
)
from review_crawler_spark.sources.corpus import (
    boilerpipe_html_corpus,
    make_boilerpipe_html,
)

_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a\s*>")


def _norm(raw: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"<[^>]*>", " ", raw)).strip()


def _reference_blocks(html: str, min_words=5, num=1, den=3):
    """Independent row-at-a-time replica of the classifier."""
    out = []
    for frag in re.split(BLOCK_SPLIT_PATTERN, html):
        text = _norm(frag)
        if not text:
            continue
        wc = len(text.split(" "))
        alen = sum(len(_norm(a)) for a in _ANCHOR_RE.findall(frag))
        out.append(
            (text, len(text), wc, alen, wc >= min_words and alen * den <= len(text) * num)
        )
    return out


PAGE = (
    "<html><head><title>T One</title></head><body>"
    '<h1>Big Heading Words</h1>'
    '<ul><li><a href="/a">home</a></li><li><a href="/b">about us</a></li></ul>'
    "<p>plain paragraph with six useful words</p>"
    '<div>linked <a href="#x">word</a> inside a long enough paragraph</div>'
    '<p><a href="/1">all</a> <a href="/2">of</a> <a href="/3">these</a>'
    ' <a href="/4">words</a> <a href="/5">are</a> <a href="/6">links</a></p>'
    "<section>short one</section>"
    "<footer>c 2026 example</footer></body></html>"
)


def test_blocks_match_python_reference(spark):
    df = spark.createDataFrame([Row(doc_id=1, html=PAGE)])
    got = [
        (r.text, r.text_len, r.word_count, r.anchor_len, r.is_content)
        for r in main_content_blocks(df).orderBy("block_idx").collect()
    ]
    assert got == _reference_blocks(PAGE)
    # the page exercises every verdict branch
    verdicts = [g[4] for g in got]
    assert verdicts.count(True) == 2  # the two real paragraphs
    texts = [g[0] for g in got]
    assert "plain paragraph with six useful words" in texts
    # nav list items are separate one-word blocks
    assert "home" in texts and "about us" in texts


def test_extract_concatenates_content_blocks(spark):
    df = spark.createDataFrame([Row(doc_id=1, html=PAGE)])
    row = extract_main_content(df).collect()[0]
    ref = _reference_blocks(PAGE)
    assert row.n_blocks == len(ref)
    kept = [t for (t, _, _, _, keep) in ref if keep]
    assert row.n_content == len(kept)
    assert row.main_text == "\n".join(kept)
    assert row.main_len == len(row.main_text)
    # the all-links paragraph has >= min_words but fails link density
    assert "links" not in row.main_text
    # the inline-link paragraph survives (low link density)
    assert "inside a long enough paragraph" in row.main_text


def test_edge_pages(spark):
    rows = [
        Row(doc_id=1, html=""),  # empty page
        Row(doc_id=2, html="<p></p><div>  </div>"),  # only empty blocks
        Row(doc_id=3, html="no tags at all just seven plain words"),
        Row(doc_id=4, html="<p>one two three four five</p>"),  # == min_words
        Row(doc_id=5, html="<p>one two three four</p>"),  # < min_words
    ]
    out = {
        r.doc_id: r
        for r in extract_main_content(spark.createDataFrame(rows)).collect()
    }
    assert (out[1].n_blocks, out[1].n_content, out[1].main_text) == (0, 0, "")
    assert out[2].n_content == 0
    assert out[3].main_text == "no tags at all just seven plain words"
    assert out[4].n_content == 1
    assert out[5].n_content == 0


def test_generator_expectations(spark):
    """The synthetic page's boilerplate is exactly the non-paragraph
    blocks: title, h1, nav, footer — all dropped; paragraphs follow the
    threshold arithmetic."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron"  # 15 words -> n3 = 5
    html = make_boilerpipe_html(7, text)
    df = spark.createDataFrame([Row(doc_id=7, html=html)])
    row = extract_main_content(df).collect()[0]
    words = text.split(" ")
    assert row.n_blocks == 7  # title, h1, nav, p0, p1, p2, footer
    p0 = " ".join(words[:5])
    p1 = " ".join(words[5:10])
    p2 = " ".join(words[10:])
    keep1 = 3 * len(words[5]) <= len(p1)
    expect = [p0] + ([p1] if keep1 else []) + [p2]
    assert row.main_text == "\n".join(expect)

    # fuzz the full golden distribution against the row-at-a-time replica
    for did in (0, 3, 11):
        h = make_boilerpipe_html(did, text)
        got = extract_main_content(
            spark.createDataFrame([Row(doc_id=did, html=h)])
        ).collect()[0]
        ref = _reference_blocks(h)
        assert got.n_blocks == len(ref)
        assert got.main_text == "\n".join(t for t, *_, k in ref if k)


def test_corpus_generator_runs_distributed(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="w" + " word" * (15 + i)) for i in range(4)]
    ).repartition(3)
    pages = boilerpipe_html_corpus(docs)
    assert pages.count() == 4
    out = extract_main_content(pages)
    assert out.filter("n_content >= 1").count() == 4
