"""Deterministic video payload table: real animated-GIF bitstreams.

The video analog of images_table — multimodal binary columns with typed
metadata (BASELINE.json input_hint shape, extended to a frame axis):

    (video_id string, bytes binary, n_frames int, w int, h int,
     fps int, caption string)

``bytes`` is a REAL GIF89a animation from the pure-Python codec
(functions/gif.py): per-frame graphic-control extensions, NETSCAPE2.0
loop block, LZW frame streams, an embedded comment extension. Frames are
a pure function of video_id: the per-id smooth field from the image
generator, translated by a per-id velocity each frame (what video motion
is) with a brightness ramp — so consecutive frames are near-dups and
distant frames are not, which is exactly the structure frame-sampling
and per-frame phash ops must preserve.

GIF is an indexed format: frames are palette-quantized BEFORE encode
(like images_table gifs), after which the bitstream round-trips pixels
LOSSLESSLY — so expected per-frame stats are computable from the
generator alone, independent of the codec (the oracle path).

Built distributively like images_df: spark.range → mapInPandas.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.gif import encode_gif_animation
from ..functions.images import GIF_PALETTE, gif_index, gif_prequantize
from .images_table import _base_pixels

VIDEOS_SCHEMA = (
    "video_id string, bytes binary, n_frames int, w int, h int, "
    "fps int, caption string"
)
_FPS = 20


def video_frames(video_id: str) -> np.ndarray:
    """Pure generator: video_id → (n, h, w, 3) uint8 palette-quantized
    frames. This is the codec-independent ground truth — the GIF round
    trip is lossless after quantization, so any per-frame expectation
    (pixel sums, phash) derives from here without touching gif.py."""
    seed = zlib.crc32(video_id.encode()) & 0xFFFFFFFF
    base, _w, _h, _fmt = _base_pixels(video_id)
    n_frames = 4 + seed % 5  # 4..8
    dy = 1 + (seed >> 5) % 3
    dx = 1 + (seed >> 7) % 3
    frames = []
    for k in range(n_frames):
        fr = np.roll(base, shift=(k * dy, k * dx), axis=(0, 1))
        # brightness ramp: distant frames drift apart perceptually
        fr = np.clip(fr.astype(np.int64) + 9 * k, 0, 255).astype(np.uint8)
        frames.append(gif_prequantize(fr))
    return np.stack(frames)


def make_video(video_id: str) -> dict:
    """video_id → full row dict (shared with tests; ``_frames`` carries
    the quantized ground-truth pixels, not part of the table)."""
    frames = video_frames(video_id)
    n, h, w, _ = frames.shape
    indices = np.stack([gif_index(f) for f in frames])
    data = encode_gif_animation(
        indices, GIF_PALETTE, delay_cs=100 // _FPS,
        comment=f"video {video_id}",
    )
    return {
        "video_id": video_id,
        "bytes": data,
        "n_frames": n,
        "w": w,
        "h": h,
        "fps": _FPS,
        "caption": f"Clip for {video_id}",
        "_frames": frames,
    }


def videos_df(spark: SparkSession, video_ids: DataFrame | list[str]) -> DataFrame:
    """Materialize the video payload table for the given ids."""
    if isinstance(video_ids, list):
        ids = spark.createDataFrame(
            [(i,) for i in video_ids], "video_id string"
        )
    else:
        ids = video_ids.select("video_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [make_video(i) for i in pdf["video_id"]]
            yield pd.DataFrame(
                {
                    "video_id": [r["video_id"] for r in rows],
                    "bytes": [r["bytes"] for r in rows],
                    "n_frames": [r["n_frames"] for r in rows],
                    "w": [r["w"] for r in rows],
                    "h": [r["h"] for r in rows],
                    "fps": [r["fps"] for r in rows],
                    "caption": [r["caption"] for r in rows],
                }
            )

    return ids.mapInPandas(gen, schema=VIDEOS_SCHEMA)
