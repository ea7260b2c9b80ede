"""Structured Streaming wrappers around the frontier admission pipeline.

The reference has no unbounded input (SURVEY.md §1.4) — batch waves are the
primary mode — but a production crawler's discovery feed IS a stream, so the
engine exposes:

- ``admit_stream``: readStream over a drop directory of discovered-URL
  parquet files → per-micro-batch admission (canonicalize → hash → dedup vs
  the url_seen table) via foreachBatch, appending to url_seen and an
  admitted sink exactly-once per batch id;
- ``host_rate_metrics``: watermarked tumbling-window per-host discovery
  rates (the politeness accounting signal, SURVEY.md §2.9 A7/C4);
- ``archive_stream``: readStream over fetched-payload drops → WARC 1.1
  segment archival (sources/warc.py) exactly-once per epoch — the
  streaming twin of the wave loop's payload persistence, in the archive
  format the corpus is consumed from (Common Crawl layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import with_url_identity

DISCOVERED_SCHEMA = "url string, ts timestamp, priority long, depth int, seq long"


def admit_batch(
    batch: DataFrame, epoch_id: int, url_seen_dir: str, admitted_dir: str
) -> None:
    """One micro-batch of streaming admission (foreachBatch body).

    Module-level so tests can invoke an epoch REPLAY directly — the
    exactly-once contract under replay is the subtle part (see the epoch
    self-exclusion below).
    """
    sp = batch.sparkSession
    ident = with_url_identity(batch).dropDuplicates(["url_hash"])
    if os.path.isdir(url_seen_dir) and any(
        not e.startswith(("_", ".")) for e in os.listdir(url_seen_dir)
    ):
        # EXCLUDE this epoch's own partition: on an epoch replay after a
        # crash between the url_seen write and the streaming-checkpoint
        # commit, url_seen already holds this epoch's hashes — anti-joining
        # against them would produce an empty `new` and overwrite
        # admitted/epoch=N with nothing (silent loss). The epoch= dir name
        # is a partition column under basePath, so the filter prunes it at
        # the scan.
        seen = (
            sp.read.option("basePath", url_seen_dir)
            .parquet(url_seen_dir)
            .filter(F.col("epoch") != epoch_id)
            .select("url_hash")
        )
        new = ident.join(seen, "url_hash", "left_anti")
    else:  # first batch: no url_seen yet (a corrupt dir must raise, not
        # silently re-admit the world)
        new = ident
    # materialize the admitted output BEFORE touching url_seen: the
    # anti-join reads url_seen lazily, so appending first would make the
    # batch's own hashes disappear from its admitted output.
    # Both writes are epoch-keyed overwrites → an epoch replay after a
    # partial failure rewrites the same partitions instead of appending
    # duplicates (exactly-once per epoch).
    epoch_dir = os.path.join(admitted_dir, f"epoch={epoch_id}")
    new.write.mode("overwrite").parquet(epoch_dir)
    sp.read.parquet(epoch_dir).select("url_hash").write.mode(
        "overwrite"
    ).parquet(os.path.join(url_seen_dir, f"epoch={epoch_id}"))


def admit_stream(
    spark: SparkSession,
    input_dir: str,
    url_seen_dir: str,
    admitted_dir: str,
    checkpoint_dir: str,
):
    """Start the streaming admission query; returns the StreamingQuery.

    Each micro-batch runs the same DataFrame admission logic as the batch
    wave loop; url_seen grows by appending each batch's novel hashes. The
    foreachBatch body is idempotent per epoch_id (overwrite-by-epoch dirs),
    giving exactly-once admitted output under retries.
    """
    stream = (
        spark.readStream.schema(DISCOVERED_SCHEMA).parquet(input_dir)
    )

    def process(batch: DataFrame, epoch_id: int) -> None:
        admit_batch(batch, epoch_id, url_seen_dir, admitted_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


PAYLOAD_STREAM_SCHEMA = (
    "url string, ts timestamp, content_type string, payload binary"
)


def archive_batch(batch: DataFrame, epoch_id: int, archive_dir: str) -> None:
    """One micro-batch of streaming WARC archival (foreachBatch body).

    Exactly-once by construction: each epoch owns ``epoch=N/`` and a
    replay REPLACES the whole directory — clearing first matters because
    a replayed batch may plan fewer partitions than the crashed attempt
    wrote, and overwrite-by-filename alone would leave stale trailing
    segments (duplicate records) behind.
    """
    import shutil

    from ..sources.warc import write_warc

    epoch_dir = os.path.join(archive_dir, f"epoch={epoch_id}")
    if os.path.isdir(epoch_dir):
        shutil.rmtree(epoch_dir)
    records = batch.select(
        "url",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("date"),
        "content_type",
        "payload",
    )
    write_warc(records, epoch_dir)


def archive_stream(
    spark: SparkSession,
    input_dir: str,
    archive_dir: str,
    checkpoint_dir: str,
):
    """Start the streaming WARC archival query; returns the StreamingQuery.

    Read the archive back with
    ``read_warc(spark, f"{archive_dir}/epoch=*/*.warc.gz")``.
    """
    stream = spark.readStream.schema(PAYLOAD_STREAM_SCHEMA).parquet(input_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        archive_batch(batch, epoch_id, archive_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rate_limited_schedule(
    discovered: DataFrame,
    budget_per_batch: int = 8,
    carryover_cap: int = 16,
):
    """Stateful per-host token-bucket scheduler over a stream
    (applyInPandasWithState) — the streaming twin of the batch wave loop's
    politeness budget (SURVEY.md §2.9 C4).

    State per host: unspent token carryover (capped). Each micro-batch a
    host may emit ``budget_per_batch + carryover`` URLs, highest
    (priority DESC, seq ASC) first; unused tokens carry over up to the cap,
    mirroring how Scrapy's per-domain slot drains bursts after quiet
    periods. Rows beyond the budget are dropped from the stream (they stay
    in the upstream frontier table in the batch engine; the stream variant
    is for live feeds where re-discovery is the norm).

    Returns (host, url, priority, granted_in_batch).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ident = with_url_identity(discovered)

    def fn(key, pdfs, state):
        host = key[0]
        carry = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["priority", "seq"], ascending=[False, True])
        allow = budget_per_batch + carry
        granted = rows.head(allow)
        new_carry = min(max(allow - len(rows), 0), carryover_cap)
        state.update((int(new_carry),))
        yield pd.DataFrame(
            {
                "host": host,
                "url": granted["canonical_url"],
                "priority": granted["priority"],
                "granted_in_batch": len(granted),
            }
        )

    return (
        ident.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType="host string, url string, priority long, "
            "granted_in_batch int",
            stateStructType="carry int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def host_rate_metrics(discovered: DataFrame) -> DataFrame:
    """Watermarked per-host tumbling-window discovery counts.

    Works on a streaming DataFrame (readStream) — 10-minute watermark
    tolerates late link discoveries; output mode append emits finalized
    windows only.
    """
    ident = with_url_identity(discovered)
    return (
        ident.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("host"))
        .agg(
            F.count("*").alias("n_urls"),
            F.approx_count_distinct("url_hash").alias("n_unique"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "host", "n_urls", "n_unique",
        )
    )
