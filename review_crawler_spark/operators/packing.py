"""Sequence packing: concat-and-chunk documents into fixed training windows.

GPT-style pretraining concatenates the token stream of all documents (in a
deterministic order) and slices it at context-length boundaries; a document
whose tokens straddle a boundary appears in both chunks. The output here is
the chunk *manifest* — (chunk_id, doc_id, tok_start, tok_end) half-open
token ranges — which is what a loader needs to materialize batches without
ever building the concatenated stream.

The only global computation is an exclusive prefix sum of per-document
token counts over the document order. A naive `Window.orderBy(key)` with no
partition key collapses the whole corpus into ONE task — the classic
driver-shaped mistake at 100 TB. ``prefix_sum`` instead runs the textbook
two-pass distributed scan:

  pass 0: range-repartition by key + sort within partitions, then pin the
          partitioning with an eager localCheckpoint (both passes MUST see
          identical partition membership);
  pass 1: per-partition totals via groupBy(partition_id) — map-side partial
          agg means the shuffle carries P rows; the P-row collect to compute
          exclusive partition offsets is the justified tiny driver step of
          the scan algorithm (P = shuffle partitions, never data-sized);
  pass 2: mapInPandas running cumsum within each partition, adding that
          partition's offset — zero shuffle, Arrow-batched.

Everything downstream of the scan (chunk-span explode, boundary math) is
built-in JVM expressions. Integer division uses SQL `div` so the math stays
exact far past float53 (a 100 TB corpus is ~10^13-14 tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def prefix_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over global ``key_col`` order.

    Appends ``out_col`` = sum of value_col over all rows with a strictly
    smaller key. Keys must be unique and values non-null (int). The result
    is a pure function of (key, value) pairs — partition boundaries chosen
    by the range sampler don't affect it."""
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    d = (
        df.repartitionByRange(parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin partition membership for both passes
    )
    totals = {
        r["_pid"]: int(r["s"])
        for r in d.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    schema = StructType(
        list(d.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def scan(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[value_col].to_numpy(dtype="int64")
            pid = int(pdf["_pid"].iloc[0])
            cum = vals.cumsum()
            pdf[out_col] = offsets.get(pid, 0) + local + (cum - vals)
            local += int(cum[-1])
            yield pdf

    return d.mapInPandas(scan, schema).drop("_pid")


def pack_chunks(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Chunk manifest for concat-and-chunk packing at ``capacity`` tokens.

    Returns (chunk_id, id, tok_start, tok_end): document ``id`` contributes
    its tokens [tok_start, tok_end) to training window ``chunk_id``. Every
    chunk except the last sums to exactly ``capacity``. Zero-token docs
    contribute no rows (they occupy no stream positions)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    d = prefix_sum(
        docs.select(id_col, tokens_col).filter(F.col(tokens_col) > 0),
        id_col,
        tokens_col,
    )
    first = F.expr(f"cum_before div {capacity}")
    last = F.expr(f"(cum_before + {tokens_col} - 1) div {capacity}")
    return (
        d.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("_n"),
            F.col("cum_before"),
            F.explode(F.sequence(first, last)).alias("chunk_id"),
        )
        .select(
            "chunk_id",
            id_col,
            F.greatest(
                F.lit(0).cast("long"),
                F.col("chunk_id") * capacity - F.col("cum_before"),
            ).alias("tok_start"),
            F.least(
                F.col("_n"),
                (F.col("chunk_id") + 1) * capacity - F.col("cum_before"),
            ).alias("tok_end"),
        )
    )
