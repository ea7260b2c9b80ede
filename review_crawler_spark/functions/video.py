"""Video frame operators: frame sampling + per-frame features.

The training-data-pipeline op over multimodal video columns: sample
every k-th frame from an opaque binary video payload and emit typed
per-frame features (dimensions, exact pixel sum, perceptual hash) —
the pre-processing step before any frame-level model sees the corpus.

Spark shape: one ``mapInPandas`` pass, Arrow-batched; the decode is
per-row independent so the op scales out linearly with partitions and
never shuffles (output rows stay in their input partition until a
downstream op asks for a different key). At 100 TB the only knob that
matters is partition sizing — frames explode row counts ~n_frames/k ×,
which the caller controls with ``every_k``.

The container here is the pure-Python animated GIF (functions/gif.py);
the ``decoder`` parameter is the production seam for MP4/WebM-capable
libraries (PyAV/decord), exactly like decode_images' codec seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .gif import decode_gif_frames
from .images import average_phash

FRAMES_SCHEMA = (
    "video_id string, frame_idx int, w int, h int, px_sum bigint, "
    "phash bigint, decode_error string"
)


def sample_frames(
    df: DataFrame, every_k: int = 2, decoder=decode_gif_frames
) -> DataFrame:
    """Sample frames 0, k, 2k, … from each video's payload.

    Emits one row per sampled frame with exact integer features
    (``px_sum`` = sum of all RGB bytes — integer-exact, so oracles hash
    cleanly) plus the frame's average-phash. Bad payloads isolate as
    ``decode_error`` rows; the UDF never throws (the reference's in-loop
    isolation, /root/reference/plos_crawler.py:307-309)."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames = decoder(bytes(data))
                except Exception as exc:  # noqa: BLE001 — isolate bad records
                    rows.append(
                        (vid, None, None, None, None, None, str(exc)[:200])
                    )
                    continue
                for idx in range(0, len(frames), every_k):
                    fr = frames[idx]
                    rows.append(
                        (
                            vid, idx, fr.shape[1], fr.shape[0],
                            int(fr.sum(dtype="int64")),
                            average_phash(fr), None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "w", "h", "px_sum", "phash",
                    "decode_error",
                ],
            )

    return df.mapInPandas(batches, schema=FRAMES_SCHEMA)
