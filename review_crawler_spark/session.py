"""SparkSession factory tuned for the sandbox (local mode) and for scale.

In local[N] mode there is one JVM; ``spark.driver.memory`` is the only memory
knob. On a real cluster the same builder config applies per executor; the
shuffle-partition count should then be ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "review_crawler_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is on: it coalesces tiny shuffle partitions at test scale and splits
    skewed ones at bench scale (the MDPI single-host skew, SURVEY.md §2.9 C5).
    Arrow is on for every pandas-UDF exchange.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch Python dispatch in the
        # canonicalize/parse UDFs (default 10k; pandas ops are O(batch))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
