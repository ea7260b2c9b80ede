"""Training-output sharding: deterministic order + size-balanced shards,
and aspect-ratio batch bucketing for image training.

The OUTPUT stage of a training-data pipeline has two jobs the engine's
other operators don't cover:

1. **Shard packing** (``shard_assign``): the curated corpus must land in
   size-balanced output shards (the WebDataset / tfrecord / Mosaic-MDS
   shape: ~N GB per shard so loader workers stream uniformly). Balanced
   means *by bytes, not by row count* — document sizes are heavy-tailed,
   so round-robin by row gives 10× shard skew. The assignment is
   cum_bytes div target: a prefix sum of sizes over a deterministic
   global order. At 100 TB the naive ``Window.orderBy(hash)`` with no
   partition key collapses into ONE task; this reuses the two-pass
   distributed scan from ``packing.prefix_sum`` (range-repartition →
   per-partition totals → P-row offsets → Arrow cumsum), so the only
   driver-side state is P integers.

2. **Aspect-ratio batch bucketing** (``image_aspect_batches``): vision
   training (NaViT packing, SDXL-style bucketed batching) groups images
   whose aspect ratio falls in the same bucket and feeds fixed-size
   batches per bucket, so a batch resizes to one shared geometry with
   minimal crop/pad waste. The manifest is (bucket, batch ordinal)
   per image — within a bucket the order is a content hash, so batch
   membership is reproducible across any partitioning/cluster size.
   The within-bucket ordinal is ALSO a prefix sum (of ones) over the
   global (bucket, hash) order — same distributed scan, then each
   bucket's start offset (a tiny per-bucket aggregate, broadcast back)
   is subtracted. No per-bucket single-task window anywhere.

Both orders key off md5(id || salt) like operators/sampling.py, so the
DuckDB oracle twin is the identical string expression and re-runs,
retries, and cluster resizes cannot reshuffle shard or batch membership
(the reference crawler's resume-determinism requirement, utils.py-style,
applied to the output stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import prefix_sum
from .sampling import sample_hash


def with_train_order(
    df: DataFrame, id_col: str, salt: str = "", out_col: str = "order_key"
) -> DataFrame:
    """Deterministic global shuffle key: md5(id || salt).

    The standard "global shuffle before training" pass — but as a pure
    column, so ordering is a property of the row, not of the run. A new
    ``salt`` draws an independent permutation (new epoch order) without
    touching the data."""
    return df.withColumn(out_col, sample_hash(F.col(id_col), salt))


def shard_assign(
    df: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
    salt: str = "",
) -> DataFrame:
    """Assign every row to a size-balanced output shard.

    Adds ``shard_id`` (long) = exclusive-prefix-sum(size) div target over
    the deterministic md5 order, i.e. greedy fill in hash order: every
    shard spans a contiguous run of the order and holds ~target_bytes
    (a row may push its shard past target by less than one row's size;
    no shard except the last starts past the target boundary).

    Scale shape: one range-shuffle (the scan's pass 0) + an Arrow cumsum;
    the SQL twin is the naive single-window form — same answer, but the
    Spark plan is the one that survives 100 TB."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    d = (
        with_train_order(df, id_col, salt)
        .withColumn("_sz", F.col(size_col).cast("long"))
        # id tiebreak: the scan needs unique keys, and md5-prefix
        # collisions must still order deterministically (sampling.py does
        # the same in its window rank)
        .withColumn(
            "_scan_key",
            F.concat(F.col("order_key"), F.lit("|"), F.col(id_col)),
        )
    )
    d = prefix_sum(d, "_scan_key", "_sz", out_col="_cum")
    return (
        d.withColumn("shard_id", F.expr(f"_cum div {target_bytes}"))
        .drop("_sz", "_cum", "_scan_key")
    )


# The SDXL-ish ratio ladder: portrait → square → landscape. Buckets are
# half-open on the ratio w/h; the ladder is deliberately coarse — training
# buckets trade geometry fidelity for batch fullness.
ASPECT_LADDER = (0.6, 0.9, 1.15, 1.6)
ASPECT_NAMES = ("tall", "portrait", "square", "landscape", "wide")


def aspect_bucket_col(w_col: str = "w", h_col: str = "h"):
    """Bucket name for ratio w/h against ASPECT_LADDER (half-open bins)."""
    ratio = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    expr = F.lit(ASPECT_NAMES[-1])
    for cut, name in zip(reversed(ASPECT_LADDER), reversed(ASPECT_NAMES[:-1])):
        expr = F.when(ratio < cut, F.lit(name)).otherwise(expr)
    return expr


def image_aspect_batches(
    images: DataFrame,
    batch_size: int,
    id_col: str = "image_id",
    salt: str = "",
) -> DataFrame:
    """Batch manifest for aspect-bucketed image training.

    Adds ``bucket`` (aspect class of w/h), ``batch_id`` (long, ordinal
    within the bucket's hash order div batch_size), and ``slot`` (0-based
    position inside the batch). Batch membership is a pure function of
    (image_id, w, h, salt).

    The within-bucket ordinal comes from a GLOBAL prefix sum of ones over
    (bucket, order_key) — the concatenated string is the scan key, so one
    distributed scan covers every bucket — minus the bucket's first global
    ordinal (a per-bucket min, broadcast back). No partition-less window,
    no per-bucket task collapse; a skewed bucket (most corpora are ~half
    "square") spreads over the range partitioner like any other key run.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    d = (
        with_train_order(images, id_col, salt)
        .withColumn("bucket", aspect_bucket_col())
        # scan key groups each bucket's rows into one contiguous key run;
        # the id tail makes keys unique and md5-prefix ties deterministic
        .withColumn(
            "_scan_key",
            F.concat(
                F.col("bucket"), F.lit("|"), F.col("order_key"),
                F.lit("|"), F.col(id_col),
            ),
        )
        .withColumn("_one", F.lit(1).cast("long"))
    )
    d = prefix_sum(d, "_scan_key", "_one", out_col="_gord")
    # two consumers below (the starts aggregate and the join's left side):
    # pin the scan output once so the cumsum pass doesn't re-run per
    # consumer — the frame is narrow (manifest columns only, payload
    # bytes long since pruned), so materializing is linear and cheap
    d = d.localCheckpoint()
    starts = d.groupBy("bucket").agg(F.min("_gord").alias("_bstart"))
    return (
        d.join(F.broadcast(starts), "bucket")
        .withColumn("_bord", F.col("_gord") - F.col("_bstart"))
        .withColumn("batch_id", F.expr(f"_bord div {batch_size}"))
        .withColumn("slot", (F.col("_bord") % batch_size).cast("int"))
        .drop("_scan_key", "_one", "_gord", "_bstart", "_bord")
    )
