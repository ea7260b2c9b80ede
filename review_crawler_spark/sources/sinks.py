"""Sources & sinks (SURVEY.md §2.1): zip-corpus scan, JSON/CSV round trips,
and a MERGE-style keyed upsert over parquet.

S1  zip-corpus scan      — plos_crawler.py:228-261 (zip namelist generator)
S6  CSV source           — mdpi_review_spider.py:47-55
S7  JSON metadata source — utils.filter_articles (schema'd read, no infer)
S8  JSON sink            — article_spider.py:98-135 dump_metadata
S10 CSV sink             — mdpi_review_spider.py:59-81 (frontier cache)
U2' keyed upsert         — the remove-then-reinsert pandas pattern
                           (file_management cell 30) as MERGE semantics
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zip_corpus_scan(
    spark: SparkSession,
    zip_path: str,
    name_filter: str | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """S1: distributed scan of a zip archive → (path, bytes).

    The namelist (cheap: central directory only) is read on the driver and
    parallelized; each task opens the zip independently and reads only its
    entries — entry reads scale out, matching the reference's
    ``rescan_reviewed`` name pre-filter pushdown (plos_crawler.py:248-253)
    by filtering the namelist BEFORE any payload I/O.
    """
    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
    if name_filter:
        import re

        rx = re.compile(name_filter)
        names = [n for n in names if rx.search(n)]
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.createDataFrame([(n,) for n in names], "path string").repartition(
        parts
    )

    def read_entries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with zipfile.ZipFile(zip_path) as zf:
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "path": pdf["path"],
                        "bytes": [zf.read(p) for p in pdf["path"]],
                    }
                )

    return ids.mapInPandas(read_entries, schema="path string, bytes binary")


def read_json_records(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S7: schema-enforced JSON read — inference off for determinism
    (the reference's dormant JSON Schema validation, utils.py:58-64)."""
    return spark.read.schema(schema).json(path)


def write_json_records(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: JSON sink (fixture-compatible exports)."""
    df.write.mode(mode).json(path)


def read_csv_frontier(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S6: CSV source with explicit schema (reviews-urls.csv cache)."""
    return spark.read.csv(path, header=True, schema=schema)


def write_csv_frontier(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S10: CSV sink (the reference's checkpoint was literally this)."""
    df.write.mode(mode).option("header", True).csv(path)


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """MERGE INTO emulation over parquet: delete-matching + insert-all.

    Replaces the reference's remove-then-reinsert pandas pattern
    (``rarts.loc[~isin]`` + concat, file_management cell 30). Commit is
    atomic: the merged table is written to a versioned sibling directory and
    a `_current` pointer file is renamed over (same seam an Iceberg MERGE
    INTO would fill).
    """
    pointer = os.path.join(table_dir, "_current")
    if os.path.exists(pointer):
        with open(pointer) as f:
            cur = f.read().strip()
        existing = spark.read.parquet(os.path.join(table_dir, cur))
        version = int(cur.split("=")[1]) + 1
        kept = existing.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        version = 0
        merged = updates
    new_dir = f"v={version}"
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, new_dir))
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        f.write(new_dir)
    os.rename(tmp, pointer)
    return spark.read.parquet(os.path.join(table_dir, new_dir))
