"""Minimal pure-Python GIF87a codec (stdlib only — no PIL/giflib).

Implements the public GIF specification (CompuServe GIF87a, as restated in
the W3C/IETF documentation): header + logical screen descriptor, global
color table, image descriptor, LZW-compressed indexed pixel data with
variable code width (3..12 bits), sub-block framing, trailer.

Scope — what the image+caption payload path needs and nothing more:
- encode: (h, w) uint8 palette-index array + (n, 3) uint8 palette →
  non-interlaced GIF87a with a global color table;
- decode: single-image, non-interlaced GIF87a/89a; 89a extension blocks
  (graphic control etc.) are skipped; local color tables supported;
  interlaced images rejected with a clear ValueError.

GIF is an indexed format: fidelity is decided by palette quantization
BEFORE encode (sources/images_table.py quantizes gif-format pixels to a
web-safe-style cube), after which encode/decode is exactly lossless —
mirroring how real figure GIFs behave (the reference downloads figure
binaries at /root/reference/plos_crawler.py:190-196).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


# ----------------------------------------------------------------- encoder


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 indices + (n, 3) uint8 palette → GIF87a bytes."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode_gif needs an (h, w) uint8 index array")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    if indices.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = indices.shape
    # global color table size: power of two >= palette size, min 2
    bits = max((len(palette) - 1).bit_length(), 1)
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table flag, color resolution, size
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor

    min_code = max(bits, 2)
    out.append(min_code)
    out += _lzw_encode(indices.flatten().tolist(), min_code)
    out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def _lzw_encode(seq: list[int], min_code: int) -> bytes:
    """GIF-variant LZW with CLEAR/EOI codes and sub-block framing."""
    clear = 1 << min_code
    eoi = clear + 1

    acc = 0
    nbits = 0
    data = bytearray()

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    put(clear, width)
    prefix: tuple[int, ...] = ()
    for sym in seq:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # grow once the next emittable code (next_code - 1) would not
            # fit in width bits — mirrors the decoder growing after its
            # table reaches 2^width entries
            if next_code > (1 << width) and width < 12:
                width += 1
        else:  # table full: emit CLEAR and restart (decoder mirrors)
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prefix = (sym,)
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        data.append(acc & 0xFF)
    # sub-block framing: <=255-byte chunks, each length-prefixed
    framed = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        framed.append(len(chunk))
        framed += chunk
    return bytes(framed)


# ----------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB (first image). Raises ValueError."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        # truncated headers / sub-blocks surface as the contract ValueError
        raise ValueError(f"malformed GIF: {exc}") from None


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # 89a extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            raw = bytearray()
            while data[pos]:
                ln = data[pos]
                raw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(raw), min_code, w * h)
            if indices.max(initial=0) >= len(table):
                raise ValueError("palette index out of range")
            return table[indices.reshape(h, w)]
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image data in GIF")


def _lzw_decode(data: bytes, min_code: int, expect: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1

    def get() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expect:
        code = get()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        # freeze at 4096: foreign encoders may legally defer the CLEAR
        # ("deferred clear") and keep emitting 12-bit codes
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:expect]), dtype=np.uint8)
