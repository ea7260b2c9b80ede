"""Atomic per-wave snapshot store — the sandbox stand-in for Iceberg.

The reference "checkpoints" by writing one JSON per article and re-checking
file existence on resume (/root/reference/plos_crawler.py:293-297) plus a
cached CSV frontier (/root/reference/crawling/crawling/spiders/
mdpi_review_spider.py:47-81). Here every wave commits an atomic snapshot:

    <base>/wave=N/<table>/ …parquet…
    <base>/_manifests/manifest-N.json   (written tmp → os.rename = atomic)

A killed run resumes from the highest complete manifest; half-written wave
directories without a manifest are ignored. With an Iceberg catalog on the
classpath the same engine code swaps `write.parquet` for
`writeTo(...).append()` and the manifest for Iceberg's own snapshot — the
interface below is the only seam (no Iceberg jars in this sandbox, per
environment constraints).

CONTRACT — what any backend (this stand-in, an Iceberg catalog, a Hive
metastore) must provide so the swap is a backend change, not a rewrite.
Conformance is pinned by tests/test_store_contract.py, which is written
against THIS contract and parametrized over store implementations:

1. **Atomic snapshot publish** (`commit_wave` / `latest_wave` / `read`):
   a wave is visible iff its manifest publish completed; data files landing
   before the publish are invisible to resume. Publish is a single atomic
   rename (POSIX `os.rename` here; Iceberg: the catalog's atomic
   metadata-pointer swap). `latest_wave()` = highest published snapshot,
   never a half-written one.
2. **O(delta) appends** (`append_delta`, `append_delta_bucketed`): each
   wave writes only its delta, addressed by the integer epoch `w`; cost is
   O(delta rows), never O(table). Iceberg: `append()` producing a new
   snapshot; `w` maps to a partition field (identity transform).
3. **Epoch-pruned reads** (`read_deltas`, `read_bucketed_deltas[_range]`):
   reads prune to `w <= up_to` (and `>= from` for ranges) at the metadata
   level — an uncommitted crash orphan at `w = N+1` is never observed.
   Iceberg: partition pruning over manifests; orphans are invisible anyway
   because a crashed write never committed its snapshot.
4. **Last-writer-wins key resolution** (`read_deltas_lww`): for each key,
   the row from the highest epoch wins. Iceberg: equivalent to a
   merge-on-read position/equality delete or the same max_by aggregate.
5. **Bucketed layout** (`append_delta_bucketed` / `read_bucketed_deltas`):
   the table is clustered by the join key into a fixed bucket count, and
   the scan REPORTS that clustering so equi-joins on the bucket columns
   plan zero Exchange on the big side. Iceberg: `bucket(N, key)` partition
   transform + storage-partitioned joins (SPJ,
   `spark.sql.sources.v2.bucketing.enabled`).
6. **Idempotent epoch replay** (`append_delta_bucketed` drop-before-write):
   re-running a crashed wave replaces exactly its own `w=wave` partition —
   commit is all-or-nothing per epoch. Iceberg: `overwritePartitions()` /
   `RewriteFiles` in one transaction.
7. **Partition GC below a committed baseline**
   (`drop_[bucketed_]partitions_below`): epochs strictly below a COMMITTED
   compaction baseline are unreachable by any read path and may be
   reclaimed; calling with a non-committed baseline is a caller bug the
   backend need not defend. Iceberg: `expireSnapshots` + orphan-file
   removal after a compaction commit.
8. **Catalog re-registration on resume** (`ensure_bucketed_registered`):
   table metadata must be reconstructible from durable state (the on-disk
   spec + partition dirs here; the catalog itself for Iceberg, where this
   is a no-op) so a NEW session resumes with every committed partition
   visible.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, base: str | os.PathLike):
        self.base = Path(base)
        (self.base / "_manifests").mkdir(parents=True, exist_ok=True)

    # ----------------------------------------------------------- commit
    def commit_wave(self, wave: int, tables: dict[str, DataFrame], extra: dict | None = None) -> None:
        """Write all tables for a wave, then atomically publish the manifest."""
        written = {}
        for name, df in tables.items():
            path = self.base / f"wave={wave}" / name
            df.write.mode("overwrite").parquet(str(path))
            written[name] = str(path)
        manifest = {
            "wave": wave,
            "tables": written,
            "committed_at": time.time(),
            **(extra or {}),
        }
        tmp = self.base / "_manifests" / f".manifest-{wave}.json.tmp"
        final = self.base / "_manifests" / f"manifest-{wave}.json"
        tmp.write_text(json.dumps(manifest, indent=2))
        os.rename(tmp, final)  # atomic on POSIX — the commit point

    # ----------------------------------------------------------- deltas
    def append_delta(self, name: str, wave: int, df: DataFrame) -> str:
        """Write a per-wave DELTA partition: <base>/<name>/w=<wave>/….

        Append-only growth for monotone tables (url_seen): each wave writes
        only its new rows — O(new) I/O, never an O(total) rewrite (at 10^10
        seen URLs a full rewrite per wave would dominate the crawl). The
        ``w=`` directory doubles as a partition column, so reads prune
        uncommitted waves for free.
        """
        path = self.base / name / f"w={wave}"
        df.write.mode("overwrite").parquet(str(path))
        return str(path)

    def drop_delta_partitions_below(self, name: str, wave: int) -> int:
        """GC plain delta-log partitions w < wave. Same contract as the
        bucketed variant: only call with a wave at or below a COMMITTED
        baseline partition that supersedes everything dropped (e.g. the
        full bloom-shard snapshot a compaction wave writes)."""
        base = self.base / name
        if not base.exists():
            return 0
        dropped = 0
        for p in base.glob("w=*"):
            if int(p.name.split("=")[1]) < wave:
                shutil.rmtree(p, ignore_errors=True)
                dropped += 1
        return dropped

    def read_deltas(self, spark: SparkSession, name: str, up_to_wave: int) -> DataFrame:
        """Union of all committed deltas (partition-pruned to w ≤ wave).

        A crash between delta write and manifest publish leaves an orphan
        ``w=N+1`` dir; the filter excludes it, so resume sees exactly the
        committed prefix.
        """
        base = self.base / name
        df = spark.read.option("basePath", str(base)).parquet(str(base))
        from pyspark.sql import functions as F

        return df.filter(F.col("w") <= up_to_wave).drop("w")

    def read_deltas_lww(
        self, spark: SparkSession, name: str, up_to_wave: int, key: str
    ) -> DataFrame:
        """Last-writer-wins view over per-wave deltas: for each key, the
        row from the highest committed wave ≤ up_to_wave. This is how the
        bloom shards reconstruct from per-wave TOUCHED-shard deltas — each
        wave persists only the shards its admissions changed (O(touched ·
        shard_bytes) write I/O), and readers resolve the newest version per
        shard instead of expecting a full snapshot anywhere."""
        base = self.base / name
        df = spark.read.option("basePath", str(base)).parquet(str(base))
        vals = [c for c in df.columns if c not in (key, "w")]
        return (
            df.filter(F.col("w") <= up_to_wave)
            .groupBy(key)
            .agg(*[F.max_by(c, "w").alias(c) for c in vals])
        )

    # -------------------------------------------------- bucketed deltas
    # Same append-only per-wave delta growth as append_delta, but through a
    # catalog table PARTITIONED BY (w) and CLUSTERED BY the join key, so a
    # consumer joining on exactly the bucket columns gets a bucketed scan —
    # NO Exchange on the (huge, cumulative) delta-table side, only the
    # small per-wave probe side shuffles. This is the engine's url_seen
    # confirm join at 10^10 URLs: without bucketing every wave sort-merge-
    # shuffles the whole seen-set. With an Iceberg/Hive catalog the same
    # calls write real bucketed tables; the in-memory catalog needs the
    # CREATE TABLE re-registration below on resume (metadata is
    # session-scoped, the parquet layout on disk is not).

    def table_name(self, name: str) -> str:
        """Catalog-safe, per-store-unique table name."""
        digest = hashlib.md5(str(self.base.resolve()).encode()).hexdigest()[:12]
        return f"rcs_{name}_{digest}"

    def _spec_path(self, name: str) -> Path:
        return self.base / f"_spec_{name}.json"

    def ensure_bucketed_registered(self, spark: SparkSession, name: str) -> str:
        """Register the bucketed delta table in this session's catalog if a
        spec exists on disk but the (session-scoped) catalog lost it — the
        resume-in-a-new-session path. MSCK recovers the committed partition
        dirs; uncommitted orphans are excluded by the read's w-filter."""
        tbl = self.table_name(name)
        if spark.catalog.tableExists(tbl):
            return tbl
        # first-ever append registers before any data lands — MSCK requires
        # the location to be listable
        (self.base / name).mkdir(parents=True, exist_ok=True)
        spec = json.loads(self._spec_path(name).read_text())
        cols = ", ".join(f"{c} {t}" for c, t in spec["columns"])
        bucket_cols = ", ".join(spec["bucket_cols"])
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}, w INT) USING PARQUET "
            f"PARTITIONED BY (w) CLUSTERED BY ({bucket_cols}) "
            f"INTO {spec['num_buckets']} BUCKETS "
            f"LOCATION '{self.base / name}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {tbl}")
        return tbl

    def append_delta_bucketed(
        self,
        name: str,
        wave: int,
        df: DataFrame,
        bucket_cols: tuple[str, ...],
        num_buckets: int = 16,
    ) -> str:
        """Write one wave's delta into the bucketed table (O(new) I/O).

        Crash-safe like append_delta: a prior crashed attempt's ``w=wave``
        leftovers are dropped (dir + catalog partition) before the append,
        so a wave replay overwrites exactly its own partition. The
        repartition onto the bucket columns caps output at num_buckets
        files per wave (bucketed writes otherwise emit one file per input
        task per bucket)."""
        spark = df.sparkSession
        loc = self.base / name
        spec_path = self._spec_path(name)
        tbl = self.table_name(name)
        if not spec_path.exists():
            spec = {
                "columns": [
                    (f.name, f.dataType.simpleString().upper())
                    for f in df.schema.fields
                ],
                "bucket_cols": list(bucket_cols),
                "num_buckets": num_buckets,
            }
            tmp = spec_path.with_suffix(".tmp")
            tmp.write_text(json.dumps(spec))
            os.rename(tmp, spec_path)
        # re-register via the spec (NOT a bare tableExists check): in a fresh
        # session an append-before-any-read would otherwise recreate the
        # table knowing only the current wave's partition, silently hiding
        # every prior delta from read_bucketed_deltas (round-3 ADVICE)
        self.ensure_bucketed_registered(spark, name)
        wdir = loc / f"w={wave}"
        if wdir.exists():
            # crash-replay only: a prior attempt's leftovers exist. The DDL
            # is skipped on the normal path because every ALTER TABLE on
            # this table makes CacheManager drop ALL cached plans that scan
            # it — and mid-wave that used to evict the wave frames and force
            # the commit writes to re-execute the admit pipeline from disk.
            # (GC keeps dir and catalog partition in lockstep, so a missing
            # dir implies no stale catalog partition to drop.)
            spark.sql(f"ALTER TABLE {tbl} DROP IF EXISTS PARTITION (w={wave})")
            shutil.rmtree(wdir)
        # cap the exchange's map-task count: per-wave deltas are budget-
        # bounded, but their plans union several cached frames (one task
        # per tiny cache partition otherwise); coalesce is a no-op when
        # the input already has fewer partitions than the cap
        map_cap = max(num_buckets, spark.sparkContext.defaultParallelism)
        (
            df.coalesce(map_cap)
            .withColumn("w", F.lit(wave))
            .repartition(num_buckets, *[F.col(c) for c in bucket_cols])
            .write.format("parquet")
            .option("path", str(loc))
            .partitionBy("w")
            .bucketBy(num_buckets, *bucket_cols)
            .mode("append")
            .saveAsTable(tbl)
        )
        # deterministic partition registration (saveAsTable(append) tracks
        # new partitions in most catalogs, but an explicit O(1) ADD is
        # cheaper and stricter than a per-wave MSCK relisting)
        spark.sql(f"ALTER TABLE {tbl} ADD IF NOT EXISTS PARTITION (w={wave})")
        return str(wdir)

    def read_bucketed_deltas(
        self, spark: SparkSession, name: str, up_to_wave: int
    ) -> DataFrame:
        """All committed deltas (catalog partition pruning on w ≤ wave);
        the scan reports the table's bucketing, so equi-joins on the bucket
        columns plan no Exchange on this side."""
        tbl = self.ensure_bucketed_registered(spark, name)
        return spark.table(tbl).filter(F.col("w") <= up_to_wave).drop("w")

    def read_bucketed_delta(
        self, spark: SparkSession, name: str, wave: int
    ) -> DataFrame:
        """Exactly one wave's delta — a single pruned partition read."""
        tbl = self.ensure_bucketed_registered(spark, name)
        return spark.table(tbl).filter(F.col("w") == wave).drop("w")

    def has_bucketed(self, name: str) -> bool:
        return self._spec_path(name).exists()

    def read_bucketed_deltas_range(
        self,
        spark: SparkSession,
        name: str,
        from_wave: int,
        up_to_wave: int,
        keep_wave: bool = False,
    ) -> DataFrame:
        """Committed deltas with from ≤ w ≤ up_to (partition-pruned both
        ends) — the frontier-log read: appends since the last compaction
        baseline, never the table's full history. ``keep_wave`` retains the
        ``w`` partition column (tombstone reads use it as the event's epoch
        in inequality join conditions)."""
        tbl = self.ensure_bucketed_registered(spark, name)
        out = spark.table(tbl).filter(
            (F.col("w") >= from_wave) & (F.col("w") <= up_to_wave)
        )
        return out if keep_wave else out.drop("w")

    def drop_bucketed_partitions_below(
        self, spark: SparkSession, name: str, wave: int
    ) -> int:
        """GC partitions w < wave (post-compaction cleanup — the delta-log
        analog of Iceberg snapshot expiry). Callers must only pass a
        ``wave`` at or below a COMMITTED compaction baseline: partitions
        below it are unreadable by any resume path, so dropping them can
        never lose state."""
        if not self.has_bucketed(name):
            return 0
        tbl = self.ensure_bucketed_registered(spark, name)
        dropped = 0
        for p in (self.base / name).glob("w=*"):
            wv = int(p.name.split("=")[1])
            if wv < wave:
                spark.sql(f"ALTER TABLE {tbl} DROP IF EXISTS PARTITION (w={wv})")
                shutil.rmtree(p, ignore_errors=True)
                dropped += 1
        return dropped

    # ----------------------------------------------------------- resume
    def latest_wave(self) -> int | None:
        waves = [
            int(p.stem.split("-")[1])
            for p in (self.base / "_manifests").glob("manifest-*.json")
        ]
        return max(waves) if waves else None

    def manifest(self, wave: int) -> dict:
        return json.loads(
            (self.base / "_manifests" / f"manifest-{wave}.json").read_text()
        )

    def read(self, spark: SparkSession, wave: int, name: str) -> DataFrame:
        return spark.read.parquet(self.manifest(wave)["tables"][name])
