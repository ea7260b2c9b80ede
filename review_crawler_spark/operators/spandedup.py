"""Span-level exact-substring deduplication (ExactSubstr, Lee et al. 2022).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) removes every substring of >= N tokens that occurs more than
once in the corpus, keeping one canonical occurrence. The reference repo
dedups at URL/version granularity only (/root/reference/elife_crawler.py:
219-234); a training-data pipeline additionally needs this *within-document
span* granularity — two near-identical pages share a 400-token boilerplate
block that document-level MinHash (operators/dedup.py) keeps twice.

The paper builds a corpus-wide suffix array — inherently sequential and
RAM-bound. The Spark-first equivalent is k-gram anchoring:

    a duplicated token span of length L >= k contains exactly L-k+1
    duplicated k-grams at CONSECUTIVE start positions, so

    grams   = posexplode over each doc's k-grams        # narrow, codegen
    marked  = gram start positions whose k-gram occurs  # ONE shuffle of
              >= min_count times corpus-wide            # (hash, doc, pos)
    spans   = gaps-and-islands merge of marked starts   # shuffle on doc_id
              (break when the gap between consecutive   # (marked rows only)
              marked positions exceeds k, i.e. the
              gram windows no longer overlap/touch)
    span    = [min(pos), max(pos) + k)                  # token coordinates

This finds precisely the maximal duplicated runs the suffix array would
(for runs >= k tokens), trading the paper's character-exact threshold for
a token-k threshold — the right trade on a cluster, since every stage is
a plain DataFrame op.

Scale notes (100 TB):
- The gram stream shuffles ONCE, as (gram_hash:int64, doc_id, pos) — the
  gram TEXT is hashed with xxhash64 in the scan projection and never
  leaves the map side. Corpus bytes therefore never shuffle at all; the
  shuffle volume is 12-20 bytes x (tokens - k + 1) rows.
- Duplicate detection is a count window over gram_hash (same shuffle that
  already carries the positions — cheaper than a separate count dim +
  join-back, which would shuffle the stream twice). A pathologically hot
  gram sorts into one task; k >= 8 word grams bound multiplicity in
  practice (hot SHORT grams are what line_dedup/repetition_stats catch).
- Keep-first canonicalisation is a row_number over (gram_hash ORDER BY
  doc_id, pos) in the SAME window shuffle: occurrence #1 of every gram
  survives, so exactly one copy of each duplicated passage is kept,
  deterministically (the lexicographically-first (doc_id, pos)).
- The islands merge shuffles only MARKED positions (duplicated content,
  typically <<1% of the corpus) keyed by doc_id.
- strip_duplicated_spans() rebuilds documents with a broadcast of the
  per-doc span lists into the corpus scan and a JVM higher-order filter
  over the token array — the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_positions(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, pos, gram_hash) for every k-gram start position, 0-based.

    Tokenisation is a split on single spaces to match the corpus format
    (and the DuckDB oracle's string_split). Docs shorter than k tokens
    contribute no rows. All expressions are JVM codegen — the transform
    builds xxhash64 values directly so the exploded rows never carry gram
    text.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")
    )
    grams = F.when(
        F.size("toks") >= k,
        F.expr(
            f"transform(sequence(0, size(toks) - {k}),"
            f" i -> xxhash64(array_join(slice(toks, i + 1, {k}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return toks.select("doc_id", F.posexplode(grams).alias("pos", "gram_hash")).withColumn(
        "pos", F.col("pos").cast("long")
    )


def _islands(marked: DataFrame, k: int) -> DataFrame:
    """Merge marked k-gram start positions into maximal spans.

    Consecutive marked positions whose gap is <= k have overlapping or
    touching gram windows and belong to one duplicated run; a gap > k
    starts a new span. Output: (doc_id, span_start, span_end, n_dup_grams)
    with span_end exclusive, in token coordinates.
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    seg = F.sum(
        F.when(gap <= k, F.lit(0)).otherwise(F.lit(1))
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marked.withColumn("seg", seg)
        .groupBy("doc_id", "seg")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("seg")
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = False,
) -> DataFrame:
    """All maximal duplicated token spans in the corpus.

    A position is marked when its k-gram occurs >= min_count times
    corpus-wide (occurrences inside the same document count — a doc that
    repeats its own passage is still duplicated content). With
    keep_first=True the lexicographically-first occurrence (doc_id, pos)
    of each gram is left unmarked, so the returned spans are exactly the
    redundant copies (what strip_duplicated_spans removes).

    Returns (doc_id, span_start, span_end, n_dup_grams); span_end is
    exclusive, coordinates are 0-based token indices.
    """
    grams = _gram_positions(docs, id_col, text_col, k)
    w = Window.partitionBy("gram_hash")
    marked = grams.withColumn("c", F.count(F.lit(1)).over(w))
    if keep_first:
        marked = marked.withColumn(
            "rn", F.row_number().over(w.orderBy("doc_id", "pos"))
        ).where((F.col("c") >= min_count) & (F.col("rn") >= 2))
    else:
        marked = marked.where(F.col("c") >= min_count)
    return _islands(marked.select("doc_id", "pos"), k)


def strip_duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite each document with redundant duplicated spans removed.

    Keep-one semantics: for every duplicated k-gram the first occurrence
    by (doc_id, pos) stays, so each duplicated passage survives exactly
    once in the corpus (Lee et al. 2022 §3.2's "remove all but one").

    Returns (doc_id, text_clean, n_spans, tokens_removed). Documents with
    no duplicated content pass through with n_spans = 0. The span lists
    are a per-doc dim aggregated from <<1% of positions, broadcast into
    the corpus scan; the reconstruction is a JVM higher-order filter over
    the token array, so the corpus never shuffles.
    """
    spans = duplicated_spans(
        docs, k=k, min_count=min_count, id_col=id_col, text_col=text_col, keep_first=True
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    joined = docs.join(
        F.broadcast(per_doc),
        docs[id_col] == per_doc["doc_id"],
        "left",
    ).select(
        docs[id_col].alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.coalesce("spans", F.array().cast("array<struct<span_start:bigint,span_end:bigint>>")).alias("spans"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
    )
    kept = F.expr(
        "transform(filter(transform(split(_text, ' '), (t, i) -> struct(t as t, i as i)),"
        " x -> NOT exists(spans, s -> x.i >= s.span_start AND x.i < s.span_end)), x -> x.t)"
    )
    # two-step projection: the higher-order reconstruction is interpreted
    # (no codegen CSE), and text_clean + tokens_removed both consume it —
    # materializing it as one intermediate column halves the per-doc HOF
    # work (CollapseProject keeps the stage split because the alias is
    # referenced more than once and is non-cheap)
    staged = joined.select(
        "doc_id",
        "n_spans",
        F.size(F.split("_text", " ")).alias("_ntok"),
        kept.alias("_kept"),
    )
    return staged.select(
        "doc_id",
        F.array_join("_kept", " ").alias("text_clean"),
        F.col("n_spans").cast("long").alias("n_spans"),
        (F.col("_ntok") - F.size("_kept")).cast("long").alias("tokens_removed"),
    )
