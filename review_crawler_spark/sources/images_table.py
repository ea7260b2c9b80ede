"""Deterministic image+caption table generator (the input_hint payload).

Schema (authoritative, BASELINE.json input_hint):
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash int64)

Pixels are a pure function of image_id (seeded numpy), encoded as real
PNG/JPEG/GIF bitstreams via the pure-Python codecs behind
functions/images.py (gif pixels are palette-quantized at generation time,
as real figure GIFs are). The stored ``phash`` is the
reference extraction: the average-hash of the *decoded* pixels, so the
engine-side decode UDF must reproduce it bit-for-bit (exactness invariant),
while raw pixels must match within PSNR ≥ 40 dB for lossy formats.

Built distributively: ``spark.range`` → ``mapInPandas`` over id batches —
generation cost scales out with partitions, nothing materializes on the
driver.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.exif import build_exif_app1
from ..functions.images import (
    average_phash,
    decode_image,
    encode_image,
    gif_prequantize,
)
from ..schemas import IMAGES_SCHEMA

_FMTS = ("png", "jpeg", "gif")


def _base_pixels(base_id: str) -> tuple[np.ndarray, int, int, str]:
    """Per-id smooth random field: a seeded 4×4 control grid, bilinearly
    upsampled (JPEG-friendly — no hard edges) plus high-frequency noise.

    Every id gets its OWN low-frequency structure, so average-hashes of
    distinct images are far apart in Hamming distance (measured: min
    cross-image distance 5 over 40 ids) — a fixed shared gradient would
    make every figure a phash near-dup of every other and render
    perceptual dedup meaningless on this corpus.
    """
    seed = zlib.crc32(base_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    w = int(24 + (seed % 5) * 8)
    h = int(16 + ((seed >> 3) % 4) * 8)
    fmt = _FMTS[seed % 3]
    ctrl = rng.integers(0, 256, size=(4, 4, 3)).astype(np.float64)
    gy = np.linspace(0.0, 3.0, h)
    gx = np.linspace(0.0, 3.0, w)
    y0 = np.clip(np.floor(gy).astype(int), 0, 2)
    x0 = np.clip(np.floor(gx).astype(int), 0, 2)
    fy = (gy - y0)[:, None, None]
    fx = (gx - x0)[None, :, None]
    c00 = ctrl[y0][:, x0]
    c01 = ctrl[y0][:, x0 + 1]
    c10 = ctrl[y0 + 1][:, x0]
    c11 = ctrl[y0 + 1][:, x0 + 1]
    base = (
        c00 * (1 - fy) * (1 - fx)
        + c01 * (1 - fy) * fx
        + c10 * fy * (1 - fx)
        + c11 * fy * fx
    )
    noise = rng.integers(0, 48, size=(h, w, 3))
    pixels = np.clip(base * 0.85 + noise, 0, 255).astype(np.uint8)
    return pixels, w, h, fmt


def image_dims(image_id: str) -> tuple[int, int]:
    """(w, h) for an id by the generator's seed math alone — no pixel
    synthesis, no encode. Shared with oracle fixtures that need only the
    geometry (e.g. aspect-bucketing twins)."""
    base_id = image_id.partition("~dup")[0] or image_id
    seed = zlib.crc32(base_id.encode()) & 0xFFFFFFFF
    return int(24 + (seed % 5) * 8), int(16 + ((seed >> 3) % 4) * 8)


def image_exif_intent(image_id: str) -> dict | None:
    """The EXIF tags the generator embeds, by seed math alone (no
    encode) — None for PNG/GIF ids, which have no EXIF container. Dup
    ids (``<base>~dupK``) inherit the base's tags, as re-exports of the
    same photo do. Shared with oracle fixtures, like ``image_dims`` —
    keeps the twin independent of both the encoder and the parser."""
    base_id = image_id.partition("~dup")[0] or image_id
    seed = zlib.crc32(base_id.encode()) & 0xFFFFFFFF
    if _FMTS[seed % 3] != "jpeg":
        return None
    return {
        "make": f"Cam-{seed % 7}",
        "model": f"MX{(seed >> 5) % 90:02d}",
        "datetime": (
            f"{2008 + seed % 16:04d}:{1 + (seed >> 4) % 12:02d}:"
            f"{1 + (seed >> 8) % 28:02d} {(seed >> 12) % 24:02d}:"
            f"{(seed >> 16) % 60:02d}:{(seed >> 20) % 60:02d}"
        ),
        "orientation": 1 + (seed >> 2) % 8,
    }


def make_image(image_id: str) -> dict:
    """Pure generator: image_id → full row dict (shared with tests).

    Ids of the form ``<base>~dup<k>`` are planted NEAR-DUPLICATES of
    ``<base>``: same control grid and dimensions, each pixel jittered by
    at most ±6 before encoding — the average-hash of such a pair lands at
    Hamming distance ≤6 (usually 0–2), far inside the ≥5 separation of
    unrelated images, which is what `phash_near_pairs` recovers.
    """
    base_id, dup_sep, _ = image_id.partition("~dup")
    pixels, w, h, fmt = _base_pixels(base_id or image_id)
    if dup_sep:
        jit = np.random.default_rng(
            (zlib.crc32(image_id.encode()) ^ 0x9E3779B9) & 0xFFFFFFFF
        )
        pixels = np.clip(
            pixels.astype(np.int64) + jit.integers(-6, 7, size=pixels.shape),
            0,
            255,
        ).astype(np.uint8)
    if fmt == "gif":
        # a real figure GIF is an indexed image: the palette step happens
        # at figure-creation time, so the SOURCE pixels are palette-bound
        # and the GIF bitstream round-trips them losslessly
        pixels = gif_prequantize(pixels)
    # embedded ancillary text (PNG tEXt / JPEG COM / GIF comment) — real
    # figure exports carry credit/tool strings; the header-walk metadata
    # scan (functions/imgmeta.py) recovers it without decoding pixels.
    # JPEGs additionally carry a real Exif APP1 (functions/exif.py).
    tags = image_exif_intent(image_id)
    data = encode_image(
        pixels,
        fmt,
        comment=f"figure {image_id}",
        exif=build_exif_app1(
            tags["make"], tags["model"], tags["datetime"],
            tags["orientation"],
        ) if tags else None,
    )
    decoded, _ = decode_image(data)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"Caption for {image_id}",
        "phash": average_phash(decoded),
        "_pixels": pixels,  # not part of the table; tests use it
    }


def images_df(spark: SparkSession, image_ids: DataFrame | list[str]) -> DataFrame:
    """Materialize the payload table for the given ids.

    ``image_ids`` may be a DataFrame with an ``image_id`` column (e.g. the
    site graph's image URLs) or a plain list.
    """
    if isinstance(image_ids, list):
        ids = spark.createDataFrame([(i,) for i in image_ids], "image_id string")
    else:
        ids = image_ids.select("image_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [make_image(i) for i in pdf["image_id"]]
            yield pd.DataFrame(
                {
                    "image_id": [r["image_id"] for r in rows],
                    "bytes": [r["bytes"] for r in rows],
                    "w": [r["w"] for r in rows],
                    "h": [r["h"] for r in rows],
                    "fmt": [r["fmt"] for r in rows],
                    "caption": [r["caption"] for r in rows],
                    "phash": [r["phash"] for r in rows],
                }
            )

    return ids.mapInPandas(gen, schema=IMAGES_SCHEMA)
