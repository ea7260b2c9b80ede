"""Minimal pure-Python PNG codec (zlib + numpy — no PIL/libpng).

Implements the public PNG specification (RFC 2083 / W3C PNG): 8-byte
signature, length-type-data-CRC chunks, IHDR/IDAT/IEND, zlib-compressed
scanlines with per-line filter types 0-4 (None/Sub/Up/Average/Paeth).

Scope — everything the image+caption payload path needs and nothing more:
- encode: 8-bit RGB (color type 2), any filter type 0-4 (one per image;
  real encoders pick per line, which decode handles anyway), optional
  Adam7 interlacing;
- decode: 8-bit gray (0), RGB (2), RGBA (6); all five filter types;
  non-interlaced AND Adam7-interlaced (each of the 7 passes is its own
  filtered sub-image over the shared deflate stream, scattered back on
  the pass grid — progressive web exports use this layout routinely).
  Grayscale replicates to RGB; RGBA drops alpha — the payload contract
  is an (h, w, 3) uint8 array.

This makes ``decode_real`` (functions/images.py) a REAL codec branch for
the reference's most common figure format (the reference downloads figure
binaries at /root/reference/plos_crawler.py:190-196; MDPI figures are
PNG/JPEG) — the JPEG sibling lives in functions/jpeg.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}

#: Adam7 pass grid: (x0, y0, dx, dy) per pass, spec order
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_rows(px: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Filter an (h, w*bpp) int32 sub-image into PNG scanline bytes
    (one filter-type byte + filtered row, per row)."""
    h, stride = px.shape
    zero = np.zeros(stride, dtype=np.int32)
    lines = []
    for y in range(h):
        row, up = px[y], (px[y - 1] if y else zero)
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), up[:-bpp]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:
            out = row - left
        elif filter_type == 2:
            out = row - up
        elif filter_type == 3:
            out = row - (left + up) // 2
        else:  # Paeth
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, up, upleft)),
                dtype=np.int32, count=stride,
            )
            out = row - pred
        lines.append(
            bytes([filter_type]) + (out % 256).astype(np.uint8).tobytes()
        )
    return b"".join(lines)


def _unfilter_rows(raw: bytes, h: int, stride: int, ch: int) -> np.ndarray:
    """Reverse per-scanline filtering: h rows of (1 + stride) bytes →
    (h, stride) uint8-valued int32 array."""
    if len(raw) != h * (1 + stride):
        raise ValueError("bad scanline data length")
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + up) % 256
        elif ft in (1, 3, 4):
            # left-neighbor dependency → sequential along x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                if ft == 1:
                    cur[x] = (line[x] + left) % 256
                elif ft == 3:
                    cur[x] = (line[x] + (left + up[x]) // 2) % 256
                else:
                    ul = up[x - ch] if x >= ch else 0
                    cur[x] = (
                        line[x] + _paeth(int(left), int(up[x]), int(ul))
                    ) % 256
        else:
            raise ValueError(f"bad filter type {ft} on line {y}")
        out[y] = cur
    return out


def _pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Non-empty Adam7 passes as (x0, y0, dx, dy, wp, hp)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def encode_png(
    pixels: np.ndarray,
    filter_type: int = 0,
    text: dict[str, str] | None = None,
    interlace: bool = False,
) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8).

    ``text`` embeds tEXt chunks (keyword → Latin-1 value, the PNG spec's
    ancillary metadata) between IHDR and IDAT; decoders that don't know
    them skip them (ancillary bit set — lowercase first letter).
    ``interlace`` emits the Adam7 layout: seven independently-filtered
    sub-images concatenated into one deflate stream, spec pass order."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_png needs an (h, w, 3) uint8 array")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    for k in text or {}:
        if not (1 <= len(k) <= 79):
            raise ValueError(f"tEXt keyword length out of range: {k!r}")
    h, w, _ = pixels.shape
    bpp = 3
    if interlace:
        body = b"".join(
            _filter_rows(
                pixels[y0::dy, x0::dx].reshape(hp, wp * bpp).astype(np.int32),
                bpp,
                filter_type,
            )
            for x0, y0, dx, dy, wp, hp in _pass_dims(w, h)
        )
    else:
        body = _filter_rows(
            pixels.reshape(h, w * bpp).astype(np.int32), bpp, filter_type
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    texts = b"".join(
        _chunk(b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1"))
        for k, v in (text or {}).items()
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + texts
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Raises ValueError on malformed input."""
    try:
        return _decode_png(data)
    except (IndexError, struct.error, zlib.error) as exc:
        # truncated chunks / bad deflate surface as the contract ValueError
        raise ValueError(f"malformed PNG: {exc}") from None


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(typ + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth} comp={comp} interlace={interlace})"
        )
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace:
        px2 = np.zeros((h, w, ch), dtype=np.int32)
        off = 0
        for x0, y0, dx, dy, wp, hp in _pass_dims(w, h):
            take = hp * (1 + wp * ch)
            sub = _unfilter_rows(raw[off : off + take], hp, wp * ch, ch)
            px2[y0::dy, x0::dx] = sub.reshape(hp, wp, ch)
            off += take
        if off != len(raw):
            raise ValueError("bad scanline data length")
        px = px2.astype(np.uint8)
    else:
        out = _unfilter_rows(raw, h, w * ch, ch)
        px = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 6:
        return px[:, :, :3]
    return px
