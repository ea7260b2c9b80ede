"""Header-walk image metadata extraction — NO pixel decode.

The multimodal-table pattern at 100 TB: the ``bytes`` column is opaque
binary, but format, dimensions, and embedded ancillary text all live in
the container HEADERS — a few hundred bytes per record. A metadata scan
that walks headers instead of decoding costs ~1% of a decode pass (no
inflate, no IDCT, no LZW), which is the difference between an afternoon
and a week when auditing a petabyte of figures. The reference stores this
metadata externally per article JSON (/root/reference/plos_crawler.py:
219-233, figures list with urls/captions); here it is recovered from the
payload itself so a corpus with lost sidecars still self-describes.

Parses the three public container formats the payload path emits:
- PNG: IHDR (width, height big-endian) + tEXt chunks (keyword\\0value);
- JPEG: marker walk to SOF0/1/2 (height, width) + COM comment segment;
- GIF: logical screen descriptor (little-endian) + comment extension.

All three walks skip entropy-coded payload by length prefixes only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .gif import GIF_SIGS, gif_comment
from .jpeg import JPEG_SOI
from .png import PNG_SIG

SNIFF_SCHEMA = (
    "image_id string, fmt string, w int, h int, comment string, "
    "sniff_error string"
)


def sniff_meta(data: bytes) -> tuple[str, int, int, str | None]:
    """(fmt, width, height, comment|None) from container headers only.

    Raises ValueError on unrecognized or truncated headers — the same
    contract as the decoders, reached without touching pixel data."""
    try:
        if data[:8] == PNG_SIG:
            return _sniff_png(data)
        if data[:2] == JPEG_SOI:
            return _sniff_jpeg(data)
        if data[:6] in GIF_SIGS:
            w, h = struct.unpack("<HH", data[6:10])
            return "gif", w, h, gif_comment(data)
    except (struct.error, IndexError) as exc:
        # short-slice unpacks inside the walkers surface as the contract
        # ValueError, same as the full decoders
        raise ValueError(f"malformed header: {exc!r}") from None
    raise ValueError("bad magic")


def _sniff_png(data: bytes) -> tuple[str, int, int, str | None]:
    pos, dims, comment = 8, None, None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        if typ == b"IHDR":
            w, h = struct.unpack(">II", data[pos + 8 : pos + 16])
            dims = (w, h)
        elif typ == b"tEXt" and comment is None:
            body = data[pos + 8 : pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated tEXt")
            _key, _, val = body.partition(b"\x00")
            comment = val.decode("latin-1")
        elif typ == b"IEND" or (typ == b"IDAT" and dims is not None):
            break  # dims precede data by spec — stop before inflate-size
        pos += 12 + length
    if dims is None:
        raise ValueError("missing IHDR")
    return "png", dims[0], dims[1], comment


def _sniff_jpeg(data: bytes) -> tuple[str, int, int, str | None]:
    pos, dims, comment = 2, None, None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        pos += 1
        # T.81 B.1.1.2: skip optional 0xFF fill bytes before the marker
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos + 3 > len(data):
            break
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: dims
            _depth, h, w = struct.unpack(">BHH", body[:5])
            dims = (w, h)
        elif marker == 0xFE and comment is None:  # COM
            comment = body.decode("utf-8", errors="replace")
        elif marker == 0xDA:  # SOS: entropy data follows — headers done
            break
        pos += seglen  # pos already sits on the length field
    if dims is None:
        raise ValueError("no SOF before scan data")
    return "jpeg", dims[0], dims[1], comment


def sniff_images(df: DataFrame) -> DataFrame:
    """Distributed metadata scan over an images table: mapInPandas header
    walk emitting (fmt, w, h, comment) per row — the cheap audit pass that
    never inflates/IDCTs/LZW-decodes the payload. Bad records isolate as
    ``sniff_error`` rows (never throws), mirroring decode_images."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "image_id": pdf["image_id"],
                "fmt": [],
                "w": [],
                "h": [],
                "comment": [],
                "sniff_error": [],
            }
            for data in pdf["bytes"]:
                try:
                    fmt, w, h, comment = sniff_meta(bytes(data))
                    row = (fmt, w, h, comment, None)
                except (ValueError, struct.error, IndexError) as exc:
                    row = (None, None, None, None, str(exc)[:200])
                for col, v in zip(
                    ("fmt", "w", "h", "comment", "sniff_error"), row
                ):
                    out[col].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=SNIFF_SCHEMA)
