"""Minimal pure-Python baseline JPEG codec (numpy only — no libjpeg/PIL).

Implements the public JPEG specification (ITU-T T.81 / ISO 10918-1),
baseline sequential DCT profile:

- encode: 8-bit RGB → JFIF bitstream. YCbCr (BT.601 full-range, the JFIF
  convention), 4:4:4 (no chroma subsampling — quality over size; the
  payload invariant is PSNR ≥ 40 dB), IJG quality-scaled Annex K
  quantization tables, the Annex K "typical" Huffman tables emitted as
  DHT segments (tables are self-describing — any standard decoder reads
  the file).
- decode: baseline (SOF0) only; 1- or 3-component scans, arbitrary
  sampling factors (4:4:4 / 4:2:2 / 4:2:0 all handled by the generic
  interleaved-MCU loop), restart intervals (DRI/RSTn), multi-segment
  DQT/DHT. Progressive (SOF2) and arithmetic coding are rejected with a
  clear ValueError.

Scope mirrors functions/png.py: everything the image+caption payload path
needs (the reference downloads figure binaries at
/root/reference/plos_crawler.py:190-196; MDPI/PLoS figures are PNG/JPEG)
and nothing more. DCT/IDCT, color transforms, quantization and zigzag are
vectorized over all blocks with numpy; only the entropy coder is a Python
loop (inherent — it is a bit-serial code), which is fine inside an Arrow
batch on the executor.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# --------------------------------------------------------------- constants

# zigzag scan order: index i of the scan -> position in the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables: (bits[1..16] counts, symbol values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: coef = D @ block @ D.T, block = D.T @ coef @ D
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex K table, clamped [1,255]."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], values: list[int]):
    """JPEG canonical Huffman assignment: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blockize(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (n_blocks, 8, 8) in raster order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _unblockize(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    restart_interval: int = 0,
    comment: str | None = None,
    exif: bytes | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes (4:4:4).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (T.81 resync points, used by streaming encoders).
    ``comment`` embeds a COM (0xFFFE) segment after APP0 — T.81's
    ancillary text marker; decoders skip it. ``exif`` is a ready APP1
    payload (functions/exif.py::build_exif_app1) emitted right after
    APP0 — decoders skip APPn segments they don't know."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg needs an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    qt_l = _scaled_quant(QUANT_LUMA, quality)
    qt_c = _scaled_quant(QUANT_CHROMA, quality)

    # pad to 8-multiples with edge replication (standard practice: avoids
    # ringing from a hard edge inside the boundary blocks)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    ycc = _rgb_to_ycbcr(pixels)
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    # all-blocks FDCT + quantize per component, then zigzag
    comp_zz = []
    for ci in range(3):
        blocks = _blockize(ycc[..., ci] - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qt = qt_l if ci == 0 else qt_c
        quant = np.round(coef.reshape(-1, 64) / qt.astype(np.float64))
        # clamp to the baseline coefficient range: keeps AC size <= 10 and
        # DC-diff size <= 11 (the standard tables' largest categories) even
        # for pathological max-amplitude blocks at quality ~100
        quant = np.clip(quant, -1023, 1023)
        comp_zz.append(quant[:, ZIGZAG].astype(np.int64))

    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 → MCU = one block per component
        if restart_interval and bi and bi % restart_interval == 0:
            # pad to byte boundary with 1-bits, then the cyclic RSTn marker
            # (raw append — markers are not byte-stuffed), and reset the DC
            # predictors, mirroring the decoder's restart handling
            if bw.nbits:
                bw.put(0x7F, 8 - bw.nbits)
            bw.out += bytes(
                [0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)]
            )
            pred = [0, 0, 0]
        for ci in range(3):
            ti = 0 if ci == 0 else 1
            zz = comp_zz[ci][bi]
            dc_codes, ac_codes = enc_dc[ti], enc_ac[ti]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[size]
            bw.put(code, length)
            if size:
                bw.put(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.put(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[(run << 4) | size]
                bw.put(code, length)
                bw.put(bits, size)
                run = 0
            if last < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.put(code, length)

    out = bytearray(JPEG_SOI)
    out += _seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    if exif is not None:
        out += _seg(0xFFE1, exif)
    if comment is not None:
        out += _seg(0xFFFE, comment.encode("utf-8"))
    out += _seg(0xFFDB, bytes([0x00]) + bytes(qt_l[ZIGZAG].tolist()))
    out += _seg(0xFFDB, bytes([0x01]) + bytes(qt_c[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, qid)
    out += _seg(0xFFC0, sof)
    for cls, tid, (bits, values) in (
        (0, 0, DC_LUMA), (0, 1, DC_CHROMA), (1, 0, AC_LUMA), (1, 1, AC_CHROMA)
    ):
        out += _seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
        )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid, tid in ((1, 0), (2, 1), (3, 1)):
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- decoder


class _HuffLUT:
    """16-bit-prefix lookup table: one peek resolves any code (codes are
    ≤16 bits), so the hot loop does a list index instead of per-bit reads.
    Plain Python lists beat numpy here — single-element access dominates."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits: list[int], values: list[int]) -> None:
        sym = [0] * 65536
        ln = [0] * 65536
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                start = code << (16 - length)
                span = 1 << (16 - length)
                if start + span > 65536:
                    raise ValueError("invalid Huffman table (code overflow)")
                sym[start : start + span] = [values[k]] * span
                ln[start : start + span] = [length] * span
                code += 1
                k += 1
            code <<= 1
        self.sym = sym
        self.ln = ln


# tables repeat across images (every encoder ships Annex K or close), so
# LUT construction amortizes to zero across a decode batch
_LUT_CACHE: dict[tuple, _HuffLUT] = {}


def _huff_lut(bits: list[int], values: list[int]) -> _HuffLUT:
    key = (tuple(bits), tuple(values))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = _LUT_CACHE[key] = _HuffLUT(bits, values)
    return lut


def _entropy_stream(data: bytes, pos: int) -> tuple[bytes, list[int]]:
    """Unstuff the scan's entropy bytes in one pass: 0xFF00 → 0xFF, RSTn
    markers recorded as offsets into the unstuffed stream, stop at the
    first real marker. 8 bytes of 0xFF padding are appended — T.81
    F.2.2.5: reads past the segment behave as 1-bits."""
    out = bytearray()
    rst: list[int] = []
    i, n = pos, len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            out += data[i:n]
            break
        out += data[i:j]
        nxt = data[j + 1]
        if nxt == 0x00:
            out.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            rst.append(len(out))
            i = j + 2
        else:
            break
    out += b"\xff" * 8
    return bytes(out), rst


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → (h, w, 3) uint8 RGB.

    Raises ValueError on non-baseline or malformed input."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as exc:
        # truncated segments / unknown scan-component ids surface as the
        # contract ValueError
        raise ValueError(f"malformed JPEG: {exc!r}") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffLUT] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        pos += 1
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them so third-party encoders' padding parses
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise ValueError("truncated at fill bytes")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1
                ).astype(np.int64)
                qtabs[tq] = zz[UNZIGZAG]
                bpos += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + n])
                huff[(cls, tid)] = _huff_lut(bits, values)
                bpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/extended)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = samp >> 4, samp & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    # T.81 B.2.2: Hi/Vi are 1..4; 0 would divide by zero
                    # in the upsample step
                    raise ValueError(f"bad sampling factors {ch}x{cv}")
                comps.append((cid, ch, cv, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("progressive/lossless JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scan, qtabs, huff, restart
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qtabs, huff, restart) -> np.ndarray:
    fh, fw, comps = frame
    by_id = {cid: (ch, cv, qid) for cid, ch, cv, qid in comps}
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)

    # per scan component: flat coefficient list (zigzag order) sized in
    # whole MCUs; one np.array at the end — no per-block numpy allocation
    coeffs, meta = [], []
    for cid, dctab, actab in scan:
        ch, cv, qid = by_id[cid]
        coeffs.append([0] * (mcuy * cv * mcux * ch * 64))
        meta.append((ch, cv, qid, huff.get((0, dctab)), huff.get((1, actab))))
        if meta[-1][3] is None or meta[-1][4] is None:
            raise ValueError("missing Huffman table for scan")

    stream, rst_offsets = _entropy_stream(data, pos)
    rst_next = 0
    acc = nbits = sp = 0
    pred = [0] * len(scan)
    seen = 0
    row_w = mcux  # MCU columns; per-component block row width = mcux * ch
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and seen == restart:
                    # byte-align at the next recorded RSTn boundary,
                    # discarding padding bits and any refill lookahead
                    if rst_next >= len(rst_offsets):
                        raise ValueError("expected RSTn at restart interval")
                    sp = rst_offsets[rst_next]
                    rst_next += 1
                    acc = nbits = 0
                    pred = [0] * len(scan)
                    seen = 0
                seen += 1
                for si, (ch, cv, qid, dc, ac) in enumerate(meta):
                    co = coeffs[si]
                    dc_sym, dc_ln = dc.sym, dc.ln
                    ac_sym, ac_ln = ac.sym, ac.ln
                    for by in range(cv):
                        for bx in range(ch):
                            base = (
                                (my * cv + by) * (row_w * ch)
                                + (mx * ch + bx)
                            ) * 64
                            while nbits < 16:
                                acc = (acc << 8) | stream[sp]
                                sp += 1
                                nbits += 8
                            peek = (acc >> (nbits - 16)) & 0xFFFF
                            ln = dc_ln[peek]
                            if not ln:
                                raise ValueError("invalid Huffman code")
                            size = dc_sym[peek]
                            if size > 15:  # baseline DC category ≤ 11
                                raise ValueError("invalid DC size category")
                            nbits -= ln
                            if size:
                                while nbits < size:
                                    acc = (acc << 8) | stream[sp]
                                    sp += 1
                                    nbits += 8
                                v = (acc >> (nbits - size)) & ((1 << size) - 1)
                                nbits -= size
                                if v < 1 << (size - 1):  # T.81 EXTEND
                                    v -= (1 << size) - 1
                                pred[si] += v
                            co[base] = pred[si]
                            k = 1
                            while k < 64:
                                while nbits < 16:
                                    acc = (acc << 8) | stream[sp]
                                    sp += 1
                                    nbits += 8
                                peek = (acc >> (nbits - 16)) & 0xFFFF
                                ln = ac_ln[peek]
                                if not ln:
                                    raise ValueError("invalid Huffman code")
                                rs = ac_sym[peek]
                                nbits -= ln
                                size = rs & 0x0F
                                if size == 0:
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rs >> 4
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                while nbits < size:
                                    acc = (acc << 8) | stream[sp]
                                    sp += 1
                                    nbits += 8
                                v = (acc >> (nbits - size)) & ((1 << size) - 1)
                                nbits -= size
                                if v < 1 << (size - 1):
                                    v -= (1 << size) - 1
                                co[base + k] = v
                                k += 1
                            acc &= (1 << nbits) - 1  # bound bigint growth
    except IndexError:
        raise ValueError("truncated entropy stream") from None

    planes = []
    for si, (ch, cv, qid, _, _) in enumerate(meta):
        if qid not in qtabs:
            raise ValueError(f"missing quant table {qid}")
        zz = np.array(coeffs[si], dtype=np.int64).reshape(-1, 64)
        coef = (zz[:, UNZIGZAG] * qtabs[qid]).astype(
            np.float64
        ).reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _D, coef, _D) + 128.0
        plane = _unblockize(blocks, mcuy * cv * 8, mcux * ch * 8)
        # upsample to full MCU-grid resolution (nearest — sufficient for the
        # PSNR invariant; encoder side is 4:4:4 anyway)
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[: fh, : fw])

    if len(planes) == 1:
        gray = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(gray[..., None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
