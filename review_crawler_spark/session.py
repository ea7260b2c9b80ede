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
    # When several local[N] JVMs share one machine (the executor-model
    # scaling harness), each JVM must size its internal pools (GC, JIT,
    # ForkJoin) for ITS slice of the machine, not for every visible core —
    # otherwise 4 co-located JVMs each spawn ~32 GC threads and collide.
    # Opt-in via env because a lone session may legitimately want the
    # default sizing.
    jvm_opts = []
    jvm_procs = os.environ.get("SPARK_GRAFT_JVM_PROCS")
    if jvm_procs:
        jvm_opts.append(f"-XX:ActiveProcessorCount={int(jvm_procs)}")
    # This VM's first-touch page faults are intermittently ~100× slow
    # (reclaim/compaction storms after large frees). Pre-touching the whole
    # heap at JVM start moves that cost out of the measured section and out
    # of concurrent-run interference — essential for the executor-model
    # scaling harness, harmless elsewhere.
    if os.environ.get("SPARK_GRAFT_JVM_PRETOUCH"):
        jvm_opts.append(f"-Xms{driver_memory}")
        jvm_opts.append("-XX:+AlwaysPreTouch")
    if jvm_opts:
        builder = builder.config(
            "spark.driver.extraJavaOptions", " ".join(jvm_opts)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
