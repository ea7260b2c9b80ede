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

from ..functions.images import (
    average_phash,
    decode_image,
    encode_image,
    gif_prequantize,
)
from ..schemas import IMAGES_SCHEMA

_FMTS = ("png", "jpeg", "gif")


def make_image(image_id: str) -> dict:
    """Pure generator: image_id → full row dict (shared with tests)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    w = int(24 + (seed % 5) * 8)
    h = int(16 + ((seed >> 3) % 4) * 8)
    fmt = _FMTS[seed % 3]
    # smooth gradient + noise → compressible but non-trivial pixels
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (xx * 255 / max(w - 1, 1))[..., None] * np.array([1.0, 0.5, 0.25])
        + (yy * 255 / max(h - 1, 1))[..., None] * np.array([0.25, 0.5, 1.0])
    ) / 2
    noise = rng.integers(0, 64, size=(h, w, 3))
    pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
    if fmt == "gif":
        # a real figure GIF is an indexed image: the palette step happens
        # at figure-creation time, so the SOURCE pixels are palette-bound
        # and the GIF bitstream round-trips them losslessly
        pixels = gif_prequantize(pixels)
    data = encode_image(pixels, fmt)
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
