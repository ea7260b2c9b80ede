"""WARC 1.1 source/sink: round trip, gzip-member framing, hardening."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    record_id_for,
    serialize_record,
    write_warc,
)

# payloads deliberately include CRLF-CRLF and non-UTF8 bytes: a parser that
# scans for record separators instead of honoring Content-Length dies here
_ROWS = [
    (
        f"https://corpus.example/doc/{i}",
        f"2026-01-{(i % 27) + 1:02d}T00:00:00Z",
        "text/html" if i % 2 else "application/octet-stream",
        (b"<html>\r\n\r\nWARC/1.1 fake\x00\xff" * 3) + bytes([i % 256]) * i,
    )
    for i in range(40)
]
_COLS = "url string, date string, content_type string, payload binary"


def _df(spark, rows=None, parts=4):
    return spark.createDataFrame(rows or _ROWS, _COLS).repartition(parts)


@pytest.mark.parametrize("compress", [True, False])
def test_warc_round_trip(spark, tmp_path, compress):
    out = str(tmp_path / ("gz" if compress else "plain"))
    manifest = write_warc(_df(spark), out, compress=compress)
    m = {r["path"]: r for r in manifest.collect()}
    assert sum(r["records"] for r in m.values()) == len(_ROWS)
    assert all(os.path.getsize(p) == m[p]["bytes"] for p in m)

    back = read_warc(spark, out)
    got = {
        r["url"]: r
        for r in back.collect()
    }
    assert len(got) == len(_ROWS)
    for url, date, ctype, payload in _ROWS:
        r = got[url]
        assert bytes(r["payload"]) == payload
        assert r["date"] == date
        assert r["content_type"] == ctype
        assert r["warc_type"] == "response"
        assert r["record_id"] == record_id_for(url, date)


def test_warc_segments_are_standard_gzip(spark, tmp_path):
    out = str(tmp_path / "std")
    write_warc(_df(spark, parts=2), out, compress=True)
    segs = sorted(os.listdir(out))
    assert segs and all(s.endswith(".warc.gz") for s in segs)
    # stdlib gzip reads concatenated members transparently
    blob = b"".join(
        gzip.decompress(open(os.path.join(out, s), "rb").read()) for s in segs
    )
    assert blob.count(b"WARC/1.1\r\n") == len(_ROWS)


def test_warc_reader_prunes_and_projects(spark, tmp_path):
    out = str(tmp_path / "proj")
    write_warc(_df(spark), out)
    n = (
        read_warc(spark, out)
        .filter(F.col("content_type") == "text/html")
        .count()
    )
    assert n == sum(1 for r in _ROWS if r[2] == "text/html")


def test_warc_deterministic_record_ids(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(_df(spark), a)
    write_warc(_df(spark), b)
    ids_a = sorted(r["record_id"] for r in read_warc(spark, a).collect())
    ids_b = sorted(r["record_id"] for r in read_warc(spark, b).collect())
    assert ids_a == ids_b and len(set(ids_a)) == len(_ROWS)


def test_warc_malformed_inputs_raise():
    rec = serialize_record("u", "d", "t", b"payload")
    with pytest.raises(ValueError):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")  # bad magic
    with pytest.raises(ValueError):
        parse_warc_bytes(rec[:-6])  # truncated terminator
    with pytest.raises(ValueError):
        parse_warc_bytes(rec + b"garbage")  # trailing junk
    bad = rec.replace(b"Content-Length: 7\r\n", b"")
    with pytest.raises(ValueError):
        parse_warc_bytes(bad)  # no length header
    import zlib as _z

    co = _z.compressobj(6, _z.DEFLATED, 31)
    member = co.compress(rec) + co.flush()
    with pytest.raises(ValueError):
        parse_warc_bytes(member[:-4])  # truncated gzip member


def test_warc_cdx_point_lookups(spark, tmp_path):
    from review_crawler_spark.sources.warc import (
        fetch_warc_records,
        write_warc_with_cdx,
    )

    out, cdx_dir = str(tmp_path / "seg"), str(tmp_path / "cdx")
    cdx = write_warc_with_cdx(_df(spark), out, cdx_dir)
    assert cdx.count() == len(_ROWS)
    # point-fetch a third of the records via their CDX entries only
    want = {u for u, *_ in _ROWS if u.endswith(("1", "4", "7"))}
    hits = cdx.filter(F.col("url").isin(*want))
    got = {
        r["url"]: bytes(r["payload"])
        for r in fetch_warc_records(spark, hits).collect()
    }
    assert got == {u: p for u, _, _, p in _ROWS if u in want}


def test_warc_cdx_offsets_address_gzip_members(spark, tmp_path):
    import zlib

    from review_crawler_spark.sources.warc import write_warc_with_cdx

    out, cdx_dir = str(tmp_path / "seg"), str(tmp_path / "cdx")
    cdx = write_warc_with_cdx(_df(spark, parts=2), out, cdx_dir).collect()
    # every (offset, length) slice must be a COMPLETE standalone gzip
    # member starting a record — the real CDX addressing convention
    for r in cdx:
        blob = open(r["segment"], "rb").read()[
            r["offset"] : r["offset"] + r["length"]
        ]
        do = zlib.decompressobj(31)
        raw = do.decompress(blob) + do.flush()
        assert do.eof and do.unused_data == b""
        assert raw.startswith(b"WARC/1.1\r\n")
        assert f"WARC-Target-URI: {r['url']}".encode() in raw


def test_warc_cdx_matches_full_scan(spark, tmp_path):
    from review_crawler_spark.sources.warc import (
        fetch_warc_records,
        read_warc,
        write_warc_with_cdx,
    )

    out, cdx_dir = str(tmp_path / "seg"), str(tmp_path / "cdx")
    cdx = write_warc_with_cdx(_df(spark), out, cdx_dir)
    via_cdx = {
        (r["url"], r["record_id"], bytes(r["payload"]))
        for r in fetch_warc_records(spark, cdx).collect()
    }
    via_scan = {
        (r["url"], r["record_id"], bytes(r["payload"]))
        for r in read_warc(spark, out).collect()
    }
    assert via_cdx == via_scan
