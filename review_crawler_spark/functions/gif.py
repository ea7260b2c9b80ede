"""Minimal pure-Python GIF87a codec (stdlib only — no PIL/giflib).

Implements the public GIF specification (CompuServe GIF87a, as restated in
the W3C/IETF documentation): header + logical screen descriptor, global
color table, image descriptor, LZW-compressed indexed pixel data with
variable code width (3..12 bits), sub-block framing, trailer.

Scope — what the image/video payload paths need and nothing more:
- encode: (h, w) uint8 palette-index array + (n, 3) uint8 palette →
  non-interlaced GIF87a with a global color table (GIF89a when an
  embedded comment is requested — 87a has no extension blocks);
- encode_gif_animation: (n, h, w) frame stack → GIF89a animation with
  per-frame graphic-control extensions and a NETSCAPE2.0 loop block —
  the sandbox's real multi-frame "video" container (frame-sampling ops
  decode it frame-by-frame);
- decode: non-interlaced GIF87a/89a, single- or multi-frame; frames with
  sub-rectangle descriptors composite onto the logical screen (disposal
  "do not dispose"); comment/graphic-control extensions are parsed or
  skipped; local color tables supported; interlaced images rejected with
  a clear ValueError.

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


def _screen_and_table(
    w: int, h: int, palette: np.ndarray, sig: bytes
) -> tuple[bytearray, int]:
    """Header + logical screen descriptor + global color table."""
    # global color table size: power of two >= palette size, min 2
    bits = max((len(palette) - 1).bit_length(), 1)
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(sig)
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += table.tobytes()
    return out, max(bits, 2)


def _comment_ext(comment: str) -> bytes:
    """GIF89a comment extension (0x21 0xFE): length-prefixed sub-blocks."""
    data = comment.encode("utf-8")
    out = bytearray(b"\x21\xfe")
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _frame_blocks(indices: np.ndarray, min_code: int) -> bytes:
    """Image descriptor + LZW data for one full-screen frame at (0, 0)."""
    h, w = indices.shape
    out = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    out.append(min_code)
    out += _lzw_encode(indices.flatten().tolist(), min_code)
    out.append(0)  # block terminator
    return bytes(out)


def _check_indices(indices: np.ndarray, palette: np.ndarray, ndim: int) -> None:
    if indices.dtype != np.uint8 or indices.ndim != ndim:
        shape = "(h, w)" if ndim == 2 else "(n, h, w)"
        raise ValueError(f"need a {shape} uint8 index array")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    if indices.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, comment: str | None = None
) -> bytes:
    """(h, w) uint8 indices + (n, 3) uint8 palette → GIF bytes.

    ``comment`` embeds a comment extension (and switches the signature to
    GIF89a — 87a predates extension blocks)."""
    _check_indices(indices, palette, 2)
    h, w = indices.shape
    sig = b"GIF89a" if comment is not None else b"GIF87a"
    out, min_code = _screen_and_table(w, h, palette, sig)
    if comment is not None:
        out += _comment_ext(comment)
    out += _frame_blocks(indices, min_code)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_animation(
    frames: np.ndarray,
    palette: np.ndarray,
    delay_cs: int = 4,
    comment: str | None = None,
) -> bytes:
    """(n, h, w) uint8 index frames → looping GIF89a animation.

    Every frame is written full-screen at (0, 0) with a graphic-control
    extension (disposal "do not dispose", ``delay_cs`` centiseconds) and
    its own LZW stream; a NETSCAPE2.0 block requests infinite looping.
    This is the multi-frame "video" container for the frame-sampling
    operators — real bitstreams any GIF viewer plays."""
    _check_indices(frames, palette, 3)
    n, h, w = frames.shape
    if n == 0:
        raise ValueError("animation needs at least one frame")
    out, min_code = _screen_and_table(w, h, palette, b"GIF89a")
    if comment is not None:
        out += _comment_ext(comment)
    # application extension: NETSCAPE2.0 loop count 0 = forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame in frames:
        # graphic control: block size 4, disposal=1 (do not dispose),
        # no transparency, delay, transparent index 0, terminator
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 1 << 2, delay_cs, 0)
        out += b"\x00"
        out += _frame_blocks(frame, min_code)
    out += b"\x3b"
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
    """GIF bytes → (h, w, 3) uint8 RGB (first frame). Raises ValueError."""
    try:
        return _walk_gif(data, max_frames=1)[0]
    except (IndexError, struct.error) as exc:
        # truncated headers / sub-blocks surface as the contract ValueError
        raise ValueError(f"malformed GIF: {exc}") from None


def decode_gif_frames(data: bytes) -> np.ndarray:
    """GIF bytes → (n, h, w, 3) uint8 RGB — every frame, composited onto
    the logical screen in stream order (the video-decode path for the
    frame-sampling operators). Raises ValueError on malformed input."""
    try:
        return np.stack(_walk_gif(data))
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed GIF: {exc}") from None


def gif_comment(data: bytes) -> str | None:
    """Extract the first comment extension WITHOUT decoding pixel data —
    a header walk that skips LZW payload sub-blocks by length only."""
    try:
        return _walk_gif(data, max_frames=0, want_comment=True)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed GIF: {exc}") from None


def _walk_gif(
    data: bytes, max_frames: int | None = None, want_comment: bool = False
):
    """Single block-walker behind the public decoders.

    ``max_frames=k`` stops after compositing k frames; ``max_frames=0``
    with ``want_comment`` walks extensions only (no LZW decode at all —
    frame data sub-blocks are skipped by their length prefixes)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    canvas: np.ndarray | None = None
    comment: str | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # 89a extension: label + sub-blocks
            label = data[pos]
            pos += 1
            parts = bytearray()
            while data[pos]:
                ln = data[pos]
                parts += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xFE and comment is None:  # comment extension
                comment = parts.decode("utf-8", errors="replace")
                if want_comment and max_frames == 0:
                    return comment
        elif block == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
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
                if max_frames == 0:
                    pos += 1 + ln  # comment walk: skip payload bytes
                    continue
                raw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if max_frames == 0:
                continue
            indices = _lzw_decode(bytes(raw), min_code, w * h)
            if indices.max(initial=0) >= len(table):
                raise ValueError("palette index out of range")
            if x + w > sw or y + h > sh:
                raise ValueError("frame exceeds logical screen")
            # disposal "do not dispose": each frame paints over the
            # previous canvas; a full-screen frame replaces it entirely
            if canvas is None:
                canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            canvas[y : y + h, x : x + w] = table[indices.reshape(h, w)]
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if want_comment and max_frames == 0:
        return comment
    if not frames:
        raise ValueError("no image data in GIF")
    return frames


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
