"""Bucketed (co-located) tables: shuffle-free equi-joins on a shared key.

At 10^10 URLs the url_seen ⋈ frontier confirm join repeats every wave; if
both sides are bucketed by ``url_hash`` into the same bucket count, Spark
plans a SortMergeJoin with NO Exchange on either side — the join cost
becomes a per-bucket local merge instead of a full shuffle of both tables
per wave. This module is that seam over the session catalog
(``bucketBy(...).saveAsTable``); with an Iceberg/Hive catalog attached the
same calls write real bucketed tables.

Verified in tests/test_bucketed.py: the co-bucketed join plan contains zero
Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 32,
    sorted_by: str | None = None, mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``."""
    writer = df.write.mode(mode).bucketBy(num_buckets, key)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    Both tables must have been written with the same ``num_buckets`` on
    ``key`` — Spark then reuses the bucketing as the join distribution and
    plans no Exchange (assert with plan_has_no_exchange)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def plan_has_no_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains no shuffle (Exchange) at all."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return "Exchange" not in plan
