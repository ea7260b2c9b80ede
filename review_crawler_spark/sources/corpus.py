"""Materialize the synthetic JATS/HTML corpus as Spark DataFrames.

Distributed generation (mapInPandas over id batches) — the corpus never
passes through the driver, so the same code generates a 10-row test corpus
or a billion-row bench corpus. The generators in sources/jats.py are pure
functions of doc_id, which is what makes the parse queries oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .jats import make_dirty_html, make_jats_xml, make_mdpi_html, make_review_html


def jats_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids(doc_id) → corpus(doc_id, xml binary)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "xml": [make_jats_xml(int(i)) for i in pdf[id_col]],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema="doc_id bigint, xml binary")


def html_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids(doc_id) → pages(doc_id, html string)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "html": [make_mdpi_html(int(i)) for i in pdf[id_col]],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema="doc_id bigint, html string")


def dirty_html_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids(doc_id) → pages with script/style/comment junk injected (S9)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "html": [make_dirty_html(int(i)) for i in pdf[id_col]],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema="doc_id bigint, html string")


def make_boilerpipe_html(doc_id: int, text: str) -> str:
    """A full page around a document's text: title/h1, a link-dense nav
    bar, three content paragraphs (the middle one opens with an inline
    citation link), and a short footer.  Pure function of (doc_id, text)
    so the DuckDB twin reconstructs the expected extraction straight from
    the documents parquet without parsing any HTML."""
    words = text.split(" ")
    n3 = len(words) // 3
    para0 = " ".join(words[:n3])
    p1w = words[n3 : 2 * n3]
    para2 = " ".join(words[2 * n3 :])
    nav = " ".join(
        f'<a href="/nav{(doc_id + i) % 7}">nav{(doc_id + i) % 7}</a>'
        for i in range(8)
    )
    para1 = ""
    if p1w:
        rest = " ".join(p1w[1:])
        para1 = f'<a href="#ref{doc_id}">{p1w[0]}</a>' + (
            " " + rest if rest else ""
        )
    return (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        f"<h1>Doc {doc_id}</h1>"
        f'<p class="nav">{nav}</p>'
        f"<p>{para0}</p><p>{para1}</p><p>{para2}</p>"
        f'<div class="footer">site footer doc {doc_id}</div>'
        f"</body></html>"
    )


def boilerpipe_html_corpus(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → pages(doc_id, html) with boilerplate around
    the text (see make_boilerpipe_html)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "html": [
                        make_boilerpipe_html(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id bigint, html string"
    )


def review_html_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids(doc_id) → review-report pages for reviewed articles only."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "html": [make_review_html(int(i)) for i in pdf[id_col]],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema="doc_id bigint, html string")
