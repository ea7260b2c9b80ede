"""Deterministic audio payload table: real RIFF/WAVE PCM bitstreams.

The audio analog of images_table / videos_table — multimodal binary
columns with typed metadata (BASELINE.json input_hint shape, mapped to
the sample axis):

    (audio_id string, bytes binary, sr int, n_samples int,
     channels int, caption string)

``bytes`` is a REAL WAV file: canonical RIFF container with a PCM
``fmt `` chunk, a ``LIST/INFO/ICMT`` comment chunk (the metadata-sniff
hook, like the PNG tEXt / JPEG COM / GIF comment the image encoders
embed), and a little-endian 16-bit interleaved ``data`` chunk. WAV is
the one mainstream audio container that is pure-Python encodable AND
losslessly round-trips samples, so — unlike the image JPEG path — the
"real codec" branch here has no approximation gate: decode equals the
generator bit-for-bit.

Samples are a pure function of audio_id: a sum of per-id sinusoids
under a linear fade envelope, quantized once to int16. That makes every
per-clip or per-window expectation (energy, peak, zero crossings)
computable from the generator alone, independent of the container —
the oracle path (same contract as videos_table.video_frames).

Built distributively like images_df: ids → mapInPandas.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, n_samples int, "
    "channels int, caption string"
)
_SR = 8000  # fixed sample rate: small clips, exact integer periods


def audio_samples(audio_id: str) -> np.ndarray:
    """Pure generator: audio_id → (n_samples, channels) int16 PCM.

    This is the codec-independent ground truth — the WAV round trip is
    bit-lossless, so any feature expectation derives from here without
    touching the encoder (the oracle never replays the container)."""
    seed = zlib.crc32(audio_id.encode()) & 0xFFFFFFFF
    n = 2000 + seed % 1500  # 0.25–0.44 s at 8 kHz
    channels = 1 + (seed >> 3) % 2
    t = np.arange(n, dtype=np.float64) / _SR
    # linear fade 1.0 → 0.3: early windows are hot, late windows quiet —
    # the structure windowed-energy ops must preserve
    env = 1.0 - 0.7 * (np.arange(n, dtype=np.float64) / max(n - 1, 1))
    chans = []
    for c in range(channels):
        f1 = 100.0 + (seed >> 5) % 900 + 40.0 * c
        f2 = 1000.0 + (seed >> 11) % 2500 + 60.0 * c
        x = 0.62 * np.sin(2 * np.pi * f1 * t) + 0.23 * np.sin(
            2 * np.pi * f2 * t + 0.5 * c
        )
        chans.append(np.round(12000.0 * env * x).astype(np.int16))
    return np.stack(chans, axis=1)


def encode_wav(samples: np.ndarray, sr: int, comment: str = "") -> bytes:
    """Encode (n, ch) int16 PCM as a canonical RIFF/WAVE bitstream.

    Chunk layout: ``fmt `` (PCM=1, 16-bit) → ``LIST/INFO/ICMT`` (when a
    comment is given; NUL-terminated, padded to even length per the RIFF
    spec) → ``data`` (little-endian interleaved). A real container, not
    a fixture format: any standard WAV reader plays it."""
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("samples must be (n, channels) int16")
    n, ch = samples.shape
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sr, sr * block_align, block_align, 16
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if comment:
        icmt = comment.encode() + b"\x00"
        if len(icmt) % 2:
            icmt += b"\x00"
        info = b"INFO" + b"ICMT" + struct.pack("<I", len(icmt)) + icmt
        chunks.append(b"LIST" + struct.pack("<I", len(info)) + info)
    data = samples.astype("<i2").tobytes()  # C-order = interleaved frames
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        chunks.append(b"\x00")  # RIFF pad byte, outside the chunk size
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_audio(audio_id: str) -> dict:
    """audio_id → full row dict (shared with tests; ``_samples`` carries
    the ground-truth PCM, not part of the table)."""
    samples = audio_samples(audio_id)
    n, ch = samples.shape
    return {
        "audio_id": audio_id,
        "bytes": encode_wav(samples, _SR, comment=f"audio {audio_id}"),
        "sr": _SR,
        "n_samples": n,
        "channels": ch,
        "caption": f"Recording for {audio_id}",
        "_samples": samples,
    }


def audios_df(
    spark: SparkSession, audio_ids: DataFrame | list[str]
) -> DataFrame:
    """Materialize the audio payload table for the given ids."""
    if isinstance(audio_ids, list):
        ids = spark.createDataFrame(
            [(i,) for i in audio_ids], "audio_id string"
        )
    else:
        ids = audio_ids.select("audio_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [make_audio(i) for i in pdf["audio_id"]]
            yield pd.DataFrame(
                {
                    "audio_id": [r["audio_id"] for r in rows],
                    "bytes": [r["bytes"] for r in rows],
                    "sr": [r["sr"] for r in rows],
                    "n_samples": [r["n_samples"] for r in rows],
                    "channels": [r["channels"] for r in rows],
                    "caption": [r["caption"] for r in rows],
                }
            )

    return ids.mapInPandas(gen, schema=AUDIO_SCHEMA)
