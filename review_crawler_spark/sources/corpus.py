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
