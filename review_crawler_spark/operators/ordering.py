"""Reproducible global corpus shuffle for training-data pipelines.

A training run needs every document assigned a GLOBAL position in a
pseudo-random order that is a pure function of the row — identical
across re-runs, retries, partition-count changes, and engines — so the
training curriculum (and any mid-epoch resume) is reproducible.
`df.orderBy(rand(seed))` fails all of that (rand is partitioning-
dependent), and `row_number() OVER (ORDER BY ...)` with no PARTITION BY
funnels the entire corpus through ONE task — the classic global-ranking
scale trap.

``global_shuffle`` keys the order off the same content hash the
sampling operators use (md5(key || salt), see sampling.py) and computes
the dense global position with the distributed two-pass ranking scheme
(TeraSort-style):

1. bucket = first ``bucket_hex`` hex chars of the hash — 16^bucket_hex
   uniform buckets (md5 is uniform, so bucket counts are balanced;
   no sampled range-partitioner needed);
2. one tiny aggregation (≤ 16^bucket_hex rows) collects per-bucket
   counts to the driver and prefix-sums them into bucket offsets — a
   justified collect, the dim is 256 rows at the default;
3. position = bucket_offset + (row_number within bucket ordered by
   (hash, key)) − 1 — the within-bucket window shuffles each row once
   on its bucket, never concentrating more than corpus/16^bucket_hex
   rows in a task.

Because the bucket is a PREFIX of the sort hash, concatenating buckets
in bucket order IS the global hash order, so the result is bit-identical
to the naive single-task ``row_number() OVER (ORDER BY hash, key)`` —
that equivalence is exactly what the DuckDB oracle checks.

The optional ``num_shards`` adds ``shard = position % num_shards`` —
round-robin output sharding in shuffled order, so every shard is an
unbiased slice of the corpus (the property streaming-ingest trainers
rely on when they read shards sequentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_hash

DEFAULT_BUCKET_HEX = 2  # 256 buckets — collect is 256 rows, tasks stay even


def global_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    num_shards: int = 0,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
) -> DataFrame:
    """Add a dense 0-based ``position`` column: the row's rank in the
    deterministic shuffled order md5(key || salt) (ties broken by key).
    ``num_shards > 0`` also adds ``shard = position % num_shards``.

    One tiny driver collect (16^bucket_hex bucket counts) + one
    bucket-keyed shuffle; no global single-task sort anywhere.

    ``key_col`` must be unique: rows sharing a key share a sort position,
    so their relative order — and which row gets which position — would
    be partitioning-dependent."""
    if not 1 <= bucket_hex <= 6:
        raise ValueError(f"bucket_hex must be in [1, 6], got {bucket_hex}")
    # a NULL key has no hash → its row would silently vanish in the
    # bucket equi-join and shift every later position; fail loudly
    # instead (executor-side, no extra pass over the data)
    h = F.when(
        F.col(key_col).isNull(),
        F.raise_error(F.lit("global_shuffle: null key_col value")),
    ).otherwise(sample_hash(F.col(key_col), salt))
    bucketed = df.withColumn("_gs_hash", h).withColumn(
        "_gs_bucket", F.substring(F.col("_gs_hash"), 1, bucket_hex)
    )
    # tiny dim: ≤ 16^bucket_hex rows — prefix-sum on the driver, then a
    # broadcast map join puts each bucket's global offset on its rows
    counts = (
        bucketed.groupBy("_gs_bucket").count().orderBy("_gs_bucket").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_gs_bucket"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(
        offsets, "_gs_bucket string, _gs_offset long"
    )
    w = Window.partitionBy("_gs_bucket").orderBy(
        F.col("_gs_hash"), F.col(key_col)
    )
    out = (
        bucketed.join(F.broadcast(off_df), "_gs_bucket")
        .withColumn(
            "position",
            (F.col("_gs_offset") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_gs_hash", "_gs_bucket", "_gs_offset")
    )
    if num_shards > 0:
        out = out.withColumn(
            "shard", F.pmod(F.col("position"), F.lit(num_shards)).cast("int")
        )
    return out
