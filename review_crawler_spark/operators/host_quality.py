"""Host-level quality gating — RefinedWeb/FineWeb-style URL filtering.

Modern web-corpus pipelines filter at TWO granularities: per-document
(Gopher rules — operators' `quality_repetition`, `lm_quality`) and
per-HOST — a domain whose pages are mostly boilerplate/spam is dropped
wholesale even though a few individual pages pass the per-doc gates
(RefinedWeb §3.1 "URL filtering", Penedo et al. 2023; C4's domain
blocklist). The reference crawler has the complementary per-host concept
on the *fetch* side (per-domain politeness budgets,
/root/reference/crawling/crawling/settings.py:28-30); this operator is the
corpus-side twin: score each host by the aggregate quality of its
documents, then keep/drop documents by their host's verdict.

Shape at 100 TB:
  1. per-doc signals are narrow JVM expressions (no shuffle);
  2. the host aggregate shuffles ONLY (host, int...) partials with map-side
     combine — cardinality = #hosts (~10^7 web-wide), not #docs;
  3. the verdict dim is broadcast back for the filter join — no shuffle of
     the corpus.

Determinism across engines: all verdicts are integer cross-multiplications
(``n_short * 100 <= n_docs * max_short_pct`` instead of a float ratio
compare), so Spark and the DuckDB oracle agree exactly regardless of
aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count

#: a document is "short" below this many whitespace tokens
SHORT_TOKENS = 20
#: host fails if more than this percent of its docs are short
MAX_SHORT_PCT = 8
#: host fails if its mean tokens/doc is below this
MIN_AVG_TOKENS = 48


def host_quality_stats(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    short_tokens: int = SHORT_TOKENS,
    max_short_pct: int = MAX_SHORT_PCT,
    min_avg_tokens: int = MIN_AVG_TOKENS,
) -> DataFrame:
    """(host, n_docs, n_tokens, n_short, keep_host) — one row per host.

    ``keep_host`` is 1 iff the host passes BOTH gates: short-doc share
    ≤ max_short_pct percent AND mean tokens/doc ≥ min_avg_tokens, both
    evaluated in exact integer arithmetic."""
    tok = token_count(F.col(text_col))
    per_doc = docs.select(
        F.col(host_col).alias("host"),
        tok.alias("tok"),
        (tok < short_tokens).cast("long").alias("is_short"),
    )
    agg = per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("n_tokens"),
        F.sum("is_short").alias("n_short"),
    )
    return agg.select(
        "host",
        "n_docs",
        "n_tokens",
        "n_short",
        (
            (F.col("n_short") * 100 <= F.col("n_docs") * max_short_pct)
            & (F.col("n_tokens") >= F.col("n_docs") * min_avg_tokens)
        )
        .cast("int")
        .alias("keep_host"),
    )


def host_quality_filter(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    **thresholds: int,
) -> DataFrame:
    """Documents whose host passes the gate, annotated with the host's
    aggregate columns. The verdict dim (#hosts rows) is broadcast — the
    corpus never shuffles."""
    stats = host_quality_stats(docs, host_col, text_col, **thresholds)
    kept = stats.filter(F.col("keep_host") == 1).drop("keep_host")
    return docs.join(
        F.broadcast(kept), docs[host_col] == kept["host"], "inner"
    ).drop("host")
