"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are staples of event-log analytics over a crawl/metrics store —
"which robots-snapshot / host-quality score was in force when this URL
was fetched" is an as-of join of the fetched log against a
slowly-changing dimension; "which fetches landed inside this maintenance
window" is a range join. Spark has no ASOF JOIN or interval-join
operator (DuckDB, Pandas, kdb do), and the naive formulations are scale
traps: an inequality theta-join plans as BroadcastNestedLoopJoin or a
cartesian product.

``asof_join`` — most recent right row at-or-before each left row, per
key. Implemented as the union/carry-forward pattern: tag both sides,
union, ONE shuffle on the key, sort by (ts, side) within the window, and
carry the last non-null right payload forward (`last(..., ignorenulls)`)
onto every left row. O(n log n) per key partition, no inequality join
anywhere in the plan. At equal timestamps the right row sorts FIRST so
the match is inclusive (right_ts ≤ left_ts). The right side must be
unique per (key, ts) — pre-aggregate if it is not (the carried payload
would otherwise be ordering-dependent).

Skew note: one window partition per key — correct and shuffle-minimal
when keys are hosts/users (large cardinality). A single mega-key needs
the range-partition + boundary-replication variant; not implemented
because the crawl store's as-of keys (host, user) are high-cardinality
by construction.

``range_join`` — point-in-interval equi-binned join (the Databricks
"bin hint" strategy): intervals explode to the integer time buckets
they overlap (≤ span/bucket + 1 copies, bucket size caller-tuned to the
typical span), points key to exactly ONE bucket, the join is a plain
(key, bucket) equi-join — hash-shuffled, AQE-skew-splittable — and the
exact containment predicate filters the bucket-collisions out. Each
qualifying (interval, point) pair appears exactly once because the
point's bucket is unique. No cartesian, no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of-backward join: every left row, plus the ``right_payload``
    columns of the latest right row with right_ts ≤ left_ts and equal
    keys (nulls when no such row). Right must be unique per (key, ts)."""
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right_payload collides with left columns: {overlap}")
    # SQL as-of semantics: a NULL right timestamp or NULL right key can
    # never satisfy (right_ts ≤ left_ts AND keys equal) — drop such rows
    # up front, or the NULL ts would sort FIRST in the carry-forward
    # window and its payload would leak onto every left row. Left rows
    # with NULL keys then land in a window partition with no right rows
    # and correctly come back payload-NULL.
    r_notnull = F.col(right_ts).isNotNull()
    for k in key_cols:
        r_notnull = r_notnull & F.col(k).isNotNull()
    right = right.filter(r_notnull)
    # the payload rides as ONE struct: a struct literal is non-null even
    # when every field is null, so (a) a right row whose payload field is
    # genuinely NULL still wins the carry-forward (per-column
    # last(ignorenulls) would leak the OLDER row's value), and (b) all
    # payload columns always come from the SAME right row
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*right_payload).alias("_rpay"),
    )
    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rpay"].dataType).alias("_rpay"),
        F.struct(*[c for c in left.columns]).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    # right rows sort before left at the same _ts (side desc) → inclusive
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc("_ts"), F.desc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_lrow",
        F.last("_rpay", ignorenulls=True).over(w).alias("_rpay"),
    )
    return carried.filter(F.col("_side") == 0).select(
        "_lrow.*", *[F.col(f"_rpay.{c}").alias(c) for c in right_payload]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """All (interval × point) rows with equal keys and
    start ≤ ts < end, via the equi-binned strategy. Returns the interval
    columns joined with the point columns (names must not collide)."""
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    overlap = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if overlap:
        raise ValueError(f"column collision outside keys: {overlap}")
    b_us = F.lit(int(bucket_seconds) * 1_000_000)

    # TIMESTAMP_NTZ inputs go through an NTZ→LTZ cast for the bucket
    # math. Under a FIXED-OFFSET session timezone that cast is a constant
    # shift — bucket co-location is preserved and the exact containment
    # test runs on the original values anyway. Under a DST timezone the
    # mapping is NOT order-preserving at transitions (spring-forward gaps
    # can put a point's bucket before its interval's start bucket,
    # silently dropping the pair), so refuse rather than mis-join.
    from pyspark.sql.types import TimestampNTZType

    has_ntz = any(
        isinstance(df.schema[c].dataType, TimestampNTZType)
        for df, c in ((points, ts_col), (intervals, start_col),
                      (intervals, end_col))
    )
    if has_ntz:
        import re as _re

        tz = points.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        if tz not in ("UTC", "GMT", "Etc/UTC", "Etc/GMT", "Z") and not (
            _re.fullmatch(r"[+-]\d{2}:\d{2}", tz)
            or _re.fullmatch(r"GMT[+-]\d{1,2}(:\d{2})?", tz)
        ):
            raise ValueError(
                "range_join over TIMESTAMP_NTZ requires a fixed-offset "
                f"session timezone; got {tz!r} (DST transitions break "
                "bucket co-location)"
            )

    def _us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / b_us),
                # end is exclusive, but a point in end's bucket can still
                # precede it — include the end bucket
                F.floor(_us(end_col) / b_us),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(_us(ts_col) / b_us))
    return (
        ivals.join(pts, [*key_cols, "_bucket"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bucket")
    )
