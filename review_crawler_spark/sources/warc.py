"""WARC 1.1 archive source & sink (ISO 28500 — the web-archive format a
crawl tier persists fetched payloads in at scale; Common Crawl's segment
layout is the model).

The reference crawler keeps fetched article payloads as loose files inside
per-journal directories and zip archives (plos_crawler.py:190-196 writes
binaries, plos_crawler.py:228-261 re-scans zips). At 10^10-URL scale the
archival shape is instead a directory of immutable multi-record WARC
segment files:

- **Sink** (``write_warc``): one ``.warc.gz`` segment per Spark partition,
  each record its own gzip member (the Common Crawl convention — a reader
  can seek to any member boundary and start decoding without touching the
  rest of the segment). The write is a distributed ``mapInPandas`` pass —
  no payload ever lands on the driver — and returns a small manifest
  DataFrame (path, records, bytes) for lineage/metrics, mirroring the
  checkpoint store's manifest discipline.
- **Source** (``read_warc``): ``spark.read.format("binaryFile")`` over the
  segment glob, then an Arrow-batched parse of each segment's records.
  The parallelism unit is the segment FILE (binary files do not split),
  which is exactly how Common Crawl is consumed: ~1 GB segments, one task
  per segment, thousands of segments per crawl. Target segment size is a
  writer-side knob (partition count), not a reader-side one.

Parsing is a real header walk: records are delimited by their declared
``Content-Length`` (never by scanning for ``\\r\\n\\r\\n``, which may occur
inside a binary payload), headers are case-insensitive, and malformed
input (bad magic, missing length, truncated payload, trailing garbage)
raises ``ValueError`` — same hardening contract as the image codecs.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"WARC/1.1"

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("segment", T.StringType(), False),
        T.StructField("record_id", T.StringType(), False),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

WARC_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("records", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

#: CDX sidecar row — (segment, offset, length) addresses one gzip member
#: (or one raw record when uncompressed), so a reader can fetch exactly
#: one record with a seek+read, never a segment scan.
WARC_CDX_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("record_id", T.StringType(), False),
        T.StructField("segment", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
    ]
)


def record_id_for(url: str, date: str) -> str:
    """Deterministic WARC-Record-ID: a urn:uuid derived from (url, date) —
    re-writing the same logical record yields the same id, so a re-run
    segment is byte-identical and dedupable."""
    h = hashlib.md5(f"{url}\x00{date}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def serialize_record(
    url: str,
    date: str,
    content_type: str,
    payload: bytes,
    warc_type: str = "response",
) -> bytes:
    """One WARC/1.1 record: header block, blank line, payload, two CRLFs."""
    headers = (
        f"WARC/1.1\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id_for(url, date)}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits=31 → gzip framing
    return co.compress(data) + co.flush()


def parse_warc_bytes(blob: bytes, segment: str = "") -> list[dict]:
    """Parse a full WARC segment (gzipped members or plain concatenation)
    into record dicts. Raises ValueError on any malformation."""
    if blob[:2] == b"\x1f\x8b":
        # concatenated gzip members → one decompress loop, member-aware
        out = bytearray()
        rest = blob
        while rest:
            do = zlib.decompressobj(31)
            try:
                out += do.decompress(rest)
            except zlib.error as exc:
                raise ValueError(f"corrupt gzip member in {segment}: {exc}")
            out += do.flush()
            if not do.eof:
                raise ValueError(f"truncated gzip member in {segment}")
            rest = do.unused_data
        blob = bytes(out)
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + len(_MAGIC)] != _MAGIC:
            raise ValueError(
                f"bad WARC magic at offset {pos} in {segment!r}"
            )
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated header block in {segment!r}")
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed header line {line!r}")
            headers[k.strip().decode().lower()] = v.strip().decode()
        if "content-length" not in headers:
            raise ValueError(f"record without Content-Length in {segment!r}")
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        body_end = body_start + length
        if blob[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"truncated or unterminated record payload in {segment!r}"
            )
        records.append(
            {
                "segment": segment,
                "record_id": headers.get("warc-record-id", ""),
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "payload": blob[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def write_warc(
    df: DataFrame,
    out_dir: str,
    compress: bool = True,
    warc_type: str = "response",
) -> DataFrame:
    """Distributed WARC sink: df(url, date, content_type, payload) → one
    segment file per non-empty partition under ``out_dir``.

    Returns the manifest DataFrame (path, records, bytes). Eager (the
    write happens before return) so callers can treat it like the other
    sinks; segments are written to a temp name then renamed, so a killed
    task never leaves a half-segment visible.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = df.select("url", "date", "content_type", "payload")

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"segment-{pid:05d}{ext}")
        buf = bytearray()
        n = 0
        for pdf in it:
            for url, date, ctype, payload in zip(
                pdf["url"], pdf["date"], pdf["content_type"], pdf["payload"]
            ):
                rec = serialize_record(
                    str(url), str(date), str(ctype), bytes(payload), warc_type
                )
                buf += _gzip_member(rec) if compress else rec
                n += 1
        if n:
            tmp = path + ".inprogress"
            with open(tmp, "wb") as fh:
                fh.write(bytes(buf))
            os.replace(tmp, path)
            yield pd.DataFrame(
                {"path": [path], "records": [n], "bytes": [len(buf)]}
            )

    manifest = cols.mapInPandas(emit, WARC_MANIFEST_SCHEMA)
    # eager: force the write exactly once, keep the manifest tiny
    rows = manifest.collect()  # manifest is O(#partitions), not O(data)
    return df.sparkSession.createDataFrame(rows, WARC_MANIFEST_SCHEMA)


def write_warc_with_cdx(
    df: DataFrame,
    out_dir: str,
    cdx_dir: str,
    compress: bool = True,
    warc_type: str = "response",
) -> DataFrame:
    """WARC sink + CDX index in ONE pass: segments as in ``write_warc``,
    plus a parquet sidecar of (url, date, record_id, segment, offset,
    length) rows — the Common Crawl cdx-index shape that makes the archive
    randomly addressable (``fetch_warc_records``) instead of scan-only.

    The CDX rows stay distributed end-to-end: the same ``mapInPandas``
    pass that streams a partition's records into its segment emits that
    partition's index rows, and Spark writes them straight to parquet —
    nothing is ever collected. Offsets address the start of the record's
    own gzip MEMBER inside the segment (the real CDX convention), so a
    fetch is open→seek(offset)→read(length)→inflate, touching ``length``
    bytes of a multi-GB segment.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = df.select("url", "date", "content_type", "payload")

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"segment-{pid:05d}{ext}")
        buf = bytearray()
        idx: list[dict] = []
        for pdf in it:
            for url, date, ctype, payload in zip(
                pdf["url"], pdf["date"], pdf["content_type"], pdf["payload"]
            ):
                rec = serialize_record(
                    str(url), str(date), str(ctype), bytes(payload), warc_type
                )
                blob = _gzip_member(rec) if compress else rec
                idx.append(
                    {
                        "url": str(url),
                        "date": str(date),
                        "record_id": record_id_for(str(url), str(date)),
                        "segment": path,
                        "offset": len(buf),
                        "length": len(blob),
                    }
                )
                buf += blob
        if idx:
            tmp = path + ".inprogress"
            with open(tmp, "wb") as fh:
                fh.write(bytes(buf))
            os.replace(tmp, path)
            yield pd.DataFrame(idx)

    cdx = cols.mapInPandas(emit, WARC_CDX_SCHEMA)
    cdx.write.mode("overwrite").parquet(cdx_dir)  # one eager pass
    return df.sparkSession.read.parquet(cdx_dir)


def fetch_warc_records(spark: SparkSession, lookups: DataFrame) -> DataFrame:
    """Random-access record fetch: (segment, offset, length) rows → full
    WARC record rows, one seek+read+inflate per row — the point-lookup
    read path over a CDX-indexed archive (no segment is ever scanned).

    ``lookups`` is any DataFrame carrying segment/offset/length (e.g. a
    filtered slice of the CDX sidecar). Lookups are grouped per segment
    within each Arrow batch so a segment's file handle opens once per
    batch, and reads happen in offset order (sequential-friendly on
    spinning/object storage).
    """
    cols = lookups.select("segment", "offset", "length")

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs: list[dict] = []
            for seg, grp in pdf.groupby("segment", sort=False):
                with open(seg, "rb") as fh:
                    for off, ln in sorted(
                        zip(grp["offset"], grp["length"])
                    ):
                        fh.seek(int(off))
                        blob = fh.read(int(ln))
                        if len(blob) != int(ln):
                            raise ValueError(
                                f"short read at {seg}:{off}+{ln}"
                            )
                        got = parse_warc_bytes(blob, segment=str(seg))
                        if len(got) != 1:
                            raise ValueError(
                                f"CDX entry at {seg}:{off} does not "
                                f"address exactly one record"
                            )
                        recs.extend(got)
            if recs:
                yield pd.DataFrame(recs)

    return cols.mapInPandas(fetch, WARC_RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC source: glob/dir of segments → record rows.

    One task per segment file (binaryFile does not split); column pruning
    still applies downstream — payload stays in Arrow buffers until a
    consumer touches it.
    """
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs: list[dict] = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                recs.extend(parse_warc_bytes(bytes(blob), segment=str(p)))
            if recs:
                yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(
        parse, WARC_RECORD_SCHEMA
    )
