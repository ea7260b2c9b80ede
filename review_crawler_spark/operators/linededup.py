"""Cross-corpus line deduplication (CCNet-style boilerplate removal).

Web corpora repeat whole lines verbatim across millions of pages (nav
bars, cookie banners, license footers). CCNet (Wenzek et al., 2020, §4.1)
drops any line whose corpus-wide occurrence count exceeds a threshold,
then reassembles each document from its surviving lines in original
order. That is exactly a groupBy + join + ordered re-agg in Spark:

    lines  = posexplode(split(text, delim))           # narrow
    counts = lines.groupBy(xxhash64(line)).count()    # shuffle #1 (hashes)
    keep   = lines JOIN counts ON hash WHERE n <= k   # shuffle #2
    docs'  = keep.groupBy(doc).agg(ordered concat)    # shuffle #3 (doc id)

Scale notes (100 TB):
- The count shuffle carries (hash:int64, partial count) only — map-side
  partial aggregation collapses each executor's repeats before the wire;
  the line TEXT never shuffles on the counting side.
- The decision join keys on the 64-bit hash, so the probe side ships
  (doc_id, pos, hash) and only surviving rows carry text into the final
  reassembly shuffle. A 64-bit collision merges two distinct lines'
  counts (over-dropping, never corrupting output text); at 10^10 lines
  the expected collision count is ~3 — acceptable for a boilerplate
  filter and documented here.
- No broadcast: the counts side is corpus-sized (distinct lines), so this
  is deliberately a sort-merge/hash shuffle join; AQE may still convert
  per-partition when a slice is small.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exploded_lines(
    df: DataFrame, id_col: str, text_col: str, delim: str = "\n"
) -> DataFrame:
    """(id, pos, line) — pos is the 0-based line ordinal inside the doc.

    ``delim`` is split literally (regex-escaped), matching the plain
    substring semantics of the SQL twin's string_split."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(delim))).alias(
            "pos", "line"
        ),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
    delim: str = "\n",
) -> DataFrame:
    """Drop lines occurring more than ``max_occurrences`` times corpus-wide.

    Returns one row per input document:
      (id, n_lines, n_kept, clean_text) — clean_text preserves the
    original relative order of surviving lines; documents whose every
    line is boilerplate survive with n_kept=0 and clean_text=''.
    """
    if max_occurrences < 1:
        raise ValueError(f"max_occurrences must be >= 1, got {max_occurrences}")
    lines = exploded_lines(df, id_col, text_col, delim).withColumn(
        "h", F.xxhash64("line")
    )
    counts = lines.groupBy("h").agg(F.count("*").alias("n"))
    keep = (
        lines.join(counts, "h")
        .filter(F.col("n") <= max_occurrences)
        .select(id_col, "pos", "line")
    )
    kept = keep.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), re.escape(delim))).alias("n_lines"),
    )
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
