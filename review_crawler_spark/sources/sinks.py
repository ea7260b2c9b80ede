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
    num_buckets: int = 16,
) -> DataFrame:
    """MERGE INTO emulation over parquet with bucket-pruned rewrites.

    Replaces the reference's remove-then-reinsert pandas pattern
    (``rarts.loc[~isin]`` + concat, file_management cell 30). Rows live in
    hash buckets of the merge key (pmod(xxhash64(key), num_buckets)); a
    merge rewrites ONLY the buckets containing update keys, in one Spark job
    (partitionBy on the bucket column). Untouched buckets keep their
    existing files — the new manifest references them in place, so merge
    I/O is O(touched buckets), never O(table) (the round-1 full-table
    rewrite was flagged as a 100 TB scale-killer). Commit is atomic: the
    ``_current`` JSON manifest (bucket → data dir) is renamed over — the
    same seam an Iceberg MERGE INTO with bucket partitioning would fill.
    """
    import json

    pointer = os.path.join(table_dir, "_current")
    if os.path.exists(pointer):
        with open(pointer) as f:
            manifest = json.load(f)
        version = manifest["version"] + 1
        buckets: dict[str, str] = dict(manifest["buckets"])
        # bucket count is fixed at table creation: existing rows live in
        # dirs keyed by the creation-time count, so honoring a different
        # caller value would silently mis-bucket the update and the
        # left_anti dedup below would miss matching keys (duplicates
        # surviving a MERGE). The manifest is authoritative; a mismatched
        # argument is a hard error, never a stripped-under-`-O` assert.
        if manifest["num_buckets"] != num_buckets:
            raise ValueError(
                f"bucket count is fixed at table creation: table has "
                f"{manifest['num_buckets']}, caller passed {num_buckets}"
            )
        num_buckets = manifest["num_buckets"]
    else:
        version = 0
        buckets = {}
    bucket_col = F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    upd = updates.withColumn("_b", bucket_col)
    touched = sorted(r["_b"] for r in upd.select("_b").distinct().collect())
    new_rel = f"v={version}"
    if touched:
        old_dirs = [
            os.path.join(table_dir, buckets[str(b)])
            for b in touched
            if str(b) in buckets
        ]
        if old_dirs:
            existing = spark.read.parquet(*old_dirs).withColumn("_b", bucket_col)
            kept = existing.join(upd.select(key), key, "left_anti")
            merged = kept.unionByName(upd)
        else:
            merged = upd
        merged.write.partitionBy("_b").mode("overwrite").parquet(
            os.path.join(table_dir, new_rel)
        )
        for b in touched:
            buckets[str(b)] = f"{new_rel}/_b={b}"
    manifest = {
        "version": version,
        "num_buckets": num_buckets,
        "key": key,
        "buckets": buckets,
        # recorded so read_merged can answer an all-empty table (zero live
        # buckets) with a correctly-typed empty DataFrame instead of an
        # empty-path parquet read error
        "schema": updates.schema.json(),
    }
    # an all-empty first merge writes no bucket dirs, so the table dir may
    # not exist yet when only the manifest needs writing
    os.makedirs(table_dir, exist_ok=True)
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, pointer)
    return read_merged(spark, table_dir)


def read_merged(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current contents of a merge_upsert table (union of live buckets)."""
    import json

    with open(os.path.join(table_dir, "_current")) as f:
        manifest = json.load(f)
    dirs = [os.path.join(table_dir, rel) for rel in manifest["buckets"].values()]
    if not dirs:
        # a first merge_upsert with an empty updates frame writes version 0
        # with zero buckets — answer with the recorded schema (the _b bucket
        # column is a partition dir component, not a data column, so live
        # reads don't carry it either)
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*dirs)
