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
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


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
