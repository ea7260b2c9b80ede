"""Image payload functions: deterministic codec, decode UDF, phash, PSNR.

The input_hint payload is an image+caption table
``(image_id, bytes, w, h, fmt, caption, phash)``. Formats:

- ``png``  — REAL PNG bitstream via the pure-Python codec in
             functions/png.py (public PNG spec, zlib + numpy — lossless,
             decodable by any standard viewer);
- ``jpeg`` — REAL baseline JFIF bitstream via the pure-Python codec in
             functions/jpeg.py (public T.81 spec, numpy DCT + Huffman);
             quality 98 → PSNR ≥ 43 dB on the generator's noisy content,
             above the 40 dB invariant for lossy formats;
- ``gif``  — REAL GIF87a bitstream via the pure-Python LZW codec in
             functions/gif.py; GIF is an indexed format, so pixels are
             quantized to a deterministic 216-color cube FIRST (that is
             what a real figure GIF is) and encode/decode of the indexed
             image is exactly lossless.

The Spark-side plumbing — schema, Arrow batching, mapInPandas signature,
partitioning — is real and tested, and all three formats are real codecs
end-to-end. Per-row invariants vs the reference extraction (BASELINE.json
input_hint): decoded-pixel allclose (PSNR ≥ 40 dB for lossy), exact
caption equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .gif import GIF_SIGS, decode_gif, encode_gif
from .jpeg import JPEG_SOI, decode_jpeg, encode_jpeg
from .png import PNG_SIG, decode_png, encode_png

_JPEG_QUALITY = 98  # keeps the noisiest generator content above 40 dB

# 6x6x6 uniform color cube (216 entries) for GIF: index = 36r' + 6g' + b'
_CUBE = np.arange(6, dtype=np.int32) * 43 + 21
GIF_PALETTE = (
    np.stack(np.meshgrid(_CUBE, _CUBE, _CUBE, indexing="ij"), axis=-1)
    .reshape(-1, 3)
    .astype(np.uint8)
)


def gif_index(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB → (h, w) uint8 index into GIF_PALETTE. The single
    definition of the cube mapping — encode and prequantize both use it,
    so the lossless-roundtrip invariant can't drift between them."""
    q = pixels.astype(np.int32) // 43
    return (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.uint8)


def gif_prequantize(pixels: np.ndarray) -> np.ndarray:
    """Snap RGB pixels to the 216-color GIF cube — the palette step every
    real GIF goes through before encoding; idempotent."""
    return GIF_PALETTE[gif_index(pixels)]

DECODED_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "phash bigint, pixels_ok boolean, mean_px double, decode_error string"
)


def encode_image(
    pixels: np.ndarray, fmt: str, comment: str | None = None,
    exif: bytes | None = None,
) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG/JPEG/GIF bitstream.
    GIF quantizes to the 216-color cube (indexed format — lossy palette
    step, lossless LZW after it). ``comment`` embeds the format's native
    ancillary text block (PNG tEXt / JPEG COM / GIF comment extension) —
    pixel data and therefore phash are unaffected; the header-walk
    extractor (functions/imgmeta.py) recovers it without decoding.
    ``exif`` (a ready APP1 payload) applies to JPEG only — PNG/GIF have
    no EXIF container."""
    if fmt == "png":
        text = {"Comment": comment} if comment is not None else None
        return encode_png(pixels, text=text)
    if fmt == "jpeg":
        return encode_jpeg(pixels, _JPEG_QUALITY, comment=comment, exif=exif)
    if fmt == "gif":
        return encode_gif(gif_index(pixels), GIF_PALETTE, comment=comment)
    raise ValueError(f"unknown format {fmt!r}")


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode codec bytes → ((h, w, 3) uint8 array, fmt). Raises on garbage.

    Dispatches on magic: PNG, baseline JPEG and GIF87a/89a all decode
    through the pure-Python codecs."""
    if data[:8] == PNG_SIG:
        return decode_png(data), "png"
    if data[:2] == JPEG_SOI:
        return decode_jpeg(data), "jpeg"
    if data[:6] in GIF_SIGS:
        return decode_gif(data), "gif"
    raise ValueError("bad magic")


def decode_real(data: bytes) -> tuple[np.ndarray, str]:
    """Real-format decode: PNG via the pure-Python PNG codec
    (functions/png.py — public spec, zlib only, all five filter types),
    baseline JPEG via the pure-Python T.81 codec (functions/jpeg.py —
    Huffman + numpy DCT, 4:4:4/4:2:2/4:2:0, restart intervals), GIF via
    the pure-Python LZW codec (functions/gif.py). Progressive JPEG and
    other formats raise ValueError; production deployments can still swap
    in a PIL/libjpeg-turbo-backed ``decoder=`` on :func:`decode_images`
    for speed — the Spark plumbing is identical for any ``bytes ->
    (pixels, fmt)`` callable (injection-tested in tests/test_images.py).

    Identical to :func:`decode_image` now that every format is a real
    codec; kept as the named production seam."""
    return decode_image(data)


def average_phash(pixels: np.ndarray, grid: int = 8) -> int:
    """Deterministic 64-bit average hash over an 8×8 grayscale downsample."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # integral-free block mean via reshape-friendly trimming
    bh, bw = max(h // grid, 1), max(w // grid, 1)
    trimmed = gray[: bh * grid, : bw * grid]
    blocks = trimmed.reshape(grid, bh, grid, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # map to signed int64 (Spark LongType)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def decode_images(df: DataFrame, decoder=decode_image) -> DataFrame:
    """U5 batch image decode: mapInPandas over the images table.

    ``decoder`` is the codec seam: any ``bytes -> (pixels (h,w,3) uint8,
    fmt str)`` callable — the pure-Python PNG/JPEG/GIF codecs by default;
    production can swap in PIL/libjpeg-turbo for raw speed. The callable is
    closed over by the Arrow batch function and shipped to executors like
    any UDF dependency.

    Emits per-row decode status + recomputed phash; UDF never throws — bad
    bytes produce ``decode_error`` rows (mirrors the reference's in-loop
    try/except isolation, /root/reference/plos_crawler.py:307-309).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "image_id": pdf["image_id"],
                "w": pdf["w"],
                "h": pdf["h"],
                "fmt": pdf["fmt"],
                "caption": pdf["caption"],
                "phash": [],
                "pixels_ok": [],
                "mean_px": [],
                "decode_error": [],
            }
            for data, fmt_c, ph in zip(pdf["bytes"], pdf["fmt"], pdf["phash"]):
                try:
                    px, fmt_d = decoder(bytes(data))
                    out["phash"].append(average_phash(px))
                    out["pixels_ok"].append(fmt_d == fmt_c)
                    out["mean_px"].append(float(px.mean()))
                    out["decode_error"].append(None)
                except Exception as exc:  # noqa: BLE001 — isolate bad records
                    out["phash"].append(ph)
                    out["pixels_ok"].append(False)
                    out["mean_px"].append(None)
                    out["decode_error"].append(str(exc)[:200])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)
