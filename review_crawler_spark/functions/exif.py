"""EXIF (APP1/TIFF) metadata — encode + header-walk extraction.

Camera and figure-export metadata rides in a JPEG APP1 segment holding a
little TIFF file: ``Exif\\0\\0`` + TIFF header (byte order II/MM, magic
42, IFD0 offset) + IFD0 as a count-prefixed array of 12-byte entries
(tag, type, count, value-or-offset — values <= 4 bytes are inlined, the
rest live at an offset in the value area). This module implements the
subset every real EXIF reader starts from — IFD0 with ASCII / SHORT /
LONG entries — per the public specs (JEITA CP-3451 "Exif 2.x" §4.6, TIFF
6.0 §2), both byte orders on read.

Why the crawler cares: orientation (tag 0x0112) decides whether decoded
pixels need a rotate before any visual model sees them, and DateTime /
Make are dedup and provenance signals — all recoverable by a header walk
that never touches entropy-coded data, like functions/imgmeta.py. The
reference downloads figure JPEGs as opaque bytes
(/root/reference/plos_crawler.py:190-196); at 100 TB the metadata pass
runs at ~1% of a decode and must be its own operator.

``extract_exif`` is one Arrow-batched mapInPandas over (image_id, bytes)
— zero shuffle, malformed payloads quarantined via ``exif_error``, never
a task failure (the imgquality.py convention).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZE = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4}

EXIF_SIG = b"Exif\x00\x00"

EXIF_SCHEMA = (
    "image_id string, fmt string, make string, model string, "
    "datetime string, orientation int, exif_error string"
)


def build_exif_app1(
    make: str | None = None,
    model: str | None = None,
    datetime_s: str | None = None,
    orientation: int | None = None,
) -> bytes:
    """APP1 payload: Exif signature + little-endian TIFF with one IFD0.

    Entries are emitted in ascending tag order (TIFF 6.0 requires sorted
    IFDs); ASCII values longer than 4 bytes (with their NUL terminator)
    go to the value area after the IFD, exactly as real writers lay it
    out."""
    entries: list[tuple[int, int, bytes]] = []
    for tag, text in (
        (TAG_MAKE, make),
        (TAG_MODEL, model),
        (TAG_DATETIME, datetime_s),
    ):
        if text is not None:
            entries.append((tag, _TYPE_ASCII, text.encode("ascii") + b"\x00"))
    if orientation is not None:
        if not 1 <= orientation <= 8:
            raise ValueError(f"orientation must be 1..8, got {orientation}")
        entries.append(
            (TAG_ORIENTATION, _TYPE_SHORT, struct.pack("<H", orientation))
        )
    entries.sort(key=lambda e: e[0])

    ifd_off = 8  # right after the TIFF header
    value_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack("<H", len(entries))
    values = b""
    for tag, typ, raw in entries:
        count = len(raw) // _TYPE_SIZE[typ]
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            ifd += struct.pack("<HHI", tag, typ, count) + inline
        else:
            ifd += struct.pack(
                "<HHII", tag, typ, count, value_off + len(values)
            )
            values += raw
    ifd += struct.pack("<I", 0)  # no next IFD
    tiff = struct.pack("<2sHI", b"II", 42, ifd_off) + ifd + values
    return EXIF_SIG + tiff


def parse_exif_app1(payload: bytes) -> dict:
    """APP1 payload → {make, model, datetime, orientation} (keys present
    only for tags found). Handles both byte orders; raises ValueError on
    anything structurally wrong — the caller decides whether that is a
    quarantine or a test failure."""
    if payload[: len(EXIF_SIG)] != EXIF_SIG:
        raise ValueError("not an Exif APP1 payload")
    t = payload[len(EXIF_SIG):]
    if len(t) < 8:
        raise ValueError("truncated TIFF header")
    order = t[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte order {order!r}")
    magic, ifd_off = struct.unpack(e + "HI", t[2:8])
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(t):
        raise ValueError("IFD0 offset past end")
    (n,) = struct.unpack(e + "H", t[ifd_off : ifd_off + 2])
    pos = ifd_off + 2
    if pos + 12 * n + 4 > len(t):
        raise ValueError("truncated IFD0")
    out: dict = {}
    for _ in range(n):
        tag, typ, count = struct.unpack(e + "HHI", t[pos : pos + 8])
        raw4 = t[pos + 8 : pos + 12]
        pos += 12
        if typ not in _TYPE_SIZE:
            continue  # rational/undefined etc. — skippable per spec
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            raw = raw4[:size]
        else:
            (off,) = struct.unpack(e + "I", raw4)
            if off + size > len(t):
                raise ValueError(f"tag 0x{tag:04x} value past end")
            raw = t[off : off + size]
        if typ == _TYPE_ASCII:
            val: object = raw.split(b"\x00", 1)[0].decode(
                "ascii", errors="replace"
            )
        elif typ == _TYPE_SHORT:
            val = struct.unpack(e + "H", raw[:2])[0]
        else:
            val = struct.unpack(e + "I", raw[:4])[0]
        if tag == TAG_MAKE:
            out["make"] = val
        elif tag == TAG_MODEL:
            out["model"] = val
        elif tag == TAG_DATETIME:
            out["datetime"] = val
        elif tag == TAG_ORIENTATION:
            out["orientation"] = int(val)  # type: ignore[arg-type]
    return out


def exif_from_jpeg(data: bytes) -> dict | None:
    """Marker-walk a JPEG to its Exif APP1 and parse it; None when the
    image simply has no EXIF (JFIF-only), ValueError on broken framing.
    Stops at SOS — APP segments precede the scan by construction."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — consume them, same walk as _decode_jpeg (jpeg.py), so a
        # padded third-party JPEG that decodes fine isn't quarantined here
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI — end of walk, no APP1 found
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            raise ValueError("truncated segment")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[: len(EXIF_SIG)] == EXIF_SIG:
            return parse_exif_app1(body)
        if marker == 0xDA:  # start of scan — no APP1 came before it
            return None
        pos += 2 + seg_len
    return None


def auto_orient_pixels(px, orientation: int):
    """Apply the EXIF orientation transform that makes stored pixels
    upright (JEITA CP-3451 §4.6.4 tag 274; the same mapping ImageMagick's
    -auto-orient and every EXIF-aware viewer applies):

      1 normal · 2 mirror-H · 3 rotate 180 · 4 mirror-V · 5 transpose ·
      6 rotate 90 CW · 7 transverse · 8 rotate 270 CW

    Pure integer index gather — bit-exact, no resampling."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return px.transpose(1, 0, 2)
    if orientation == 6:
        return px.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return px.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return px.transpose(1, 0, 2)[::-1, :]
    return px


ORIENT_SCHEMA = (
    "image_id string, fmt string, orientation int, w int, h int, "
    "out_w int, out_h int, px_sum long, orient_error string"
)


def auto_orient_images(
    images: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode → EXIF orientation → upright pixels, reporting oriented
    geometry and the exact integer pixel sum (rotation-invariant — the
    oriented sum must equal the decoded sum, which units pin against a
    scalar reference). One Arrow-batched pass, zero shuffle; payloads
    without EXIF (PNG/GIF, JFIF-only JPEG) are orientation 1."""
    from .images import decode_image

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data)
                try:
                    px, fmt = decode_image(b)
                    orient = 1
                    if fmt == "jpeg":
                        orient = (exif_from_jpeg(b) or {}).get(
                            "orientation", 1
                        )
                    out = auto_orient_pixels(px, orient)
                    rows.append((
                        iid, fmt, orient,
                        px.shape[1], px.shape[0],
                        out.shape[1], out.shape[0],
                        int(out.astype("int64").sum()), None,
                    ))
                except ValueError as exc:
                    rows.append(
                        (iid, None, None, None, None, None, None, None,
                         str(exc))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "orientation", "w", "h",
                    "out_w", "out_h", "px_sum", "orient_error",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(walk, ORIENT_SCHEMA)


def extract_exif(
    images: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(image_id, fmt, make, model, datetime, orientation, exif_error) —
    the EXIF audit pass. Non-JPEG payloads (PNG/GIF have no EXIF
    container in this corpus) and JFIF-only JPEGs yield all-null tag
    columns with fmt still reported; broken payloads land in
    ``exif_error``."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data)
                fmt = (
                    "jpeg" if b[:2] == b"\xff\xd8"
                    else "png" if b[:8] == b"\x89PNG\r\n\x1a\n"
                    else "gif" if b[:3] == b"GIF"
                    else "unknown"
                )
                make = model = dt = err = None
                orient = None
                if fmt == "jpeg":
                    try:
                        tags = exif_from_jpeg(b) or {}
                        make = tags.get("make")
                        model = tags.get("model")
                        dt = tags.get("datetime")
                        orient = tags.get("orientation")
                    except ValueError as exc:
                        err = str(exc)
                rows.append((iid, fmt, make, model, dt, orient, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "make", "model", "datetime",
                    "orientation", "exif_error",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(walk, EXIF_SCHEMA)
