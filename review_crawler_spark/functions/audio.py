"""Audio operators: WAV decode, metadata sniff, clip + window features.

The audio-modality pre-processing family for a multimodal training-data
pipeline (images/video analogs: functions/images.py, functions/video.py):

- ``decode_wav``      — pure-Python RIFF/WAVE walker → int16 PCM. A REAL
                        codec path end-to-end (WAV is lossless PCM), not
                        a stub: malformed input always raises ValueError
                        (same hardening contract as the image decoders).
- ``sniff_wav``       — header-walk metadata WITHOUT touching the sample
                        payload: chunk sizes alone locate fmt/ICMT/data,
                        the ~1%-of-a-decode audit pass (imgmeta analog).
- ``audio_features``  — one row per clip: integer-exact energy/peak/
                        zero-crossing features over the full PCM.
- ``sample_audio_windows`` — one row per fixed-size analysis window
                        (win samples every hop): the frame-sampling op
                        on the sample axis, explode-controlled by hop.

Spark shape: every op is a single ``mapInPandas`` pass, Arrow-batched,
per-row independent — scales out linearly with partitions, zero shuffle
until a downstream key asks for one. All emitted features are integers
(sums of squares / absolute values / crossing counts), so DuckDB oracle
twins hash bit-exactly. Bad payloads isolate as ``decode_error`` rows;
the UDFs never throw (the reference's in-loop isolation,
/root/reference/plos_crawler.py:307-309).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _walk_riff(data: bytes) -> list[tuple[bytes, int, int]]:
    """RIFF chunk walk: [(fourcc, payload_offset, payload_size)].
    Skips payloads by their length prefix only (header-walk); raises
    ValueError on any structural lie (truncation, bad magic)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size exceeds payload")
    chunks = []
    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns RIFF payload")
        chunks.append((fourcc, pos + 8, size))
        pos += 8 + size + (size % 2)  # chunks are even-aligned
    return chunks


def _parse_fmt(data: bytes, off: int, size: int) -> tuple[int, int]:
    if size < 16:
        raise ValueError("fmt chunk too short")
    tag, ch, sr, _br, _ba, bits = struct.unpack(
        "<HHIIHH", data[off:off + 16]
    )
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding tag={tag} bits={bits}")
    if ch < 1:
        raise ValueError("channels must be >= 1")
    return sr, ch


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM-16 WAV bitstream → (sample_rate, (n, ch) int16).

    Bit-lossless by format; tolerates unknown chunks anywhere (skipped
    by length prefix); raises ValueError for anything malformed."""
    chunks = _walk_riff(data)
    sr = ch = None
    pcm = None
    for fourcc, off, size in chunks:
        if fourcc == b"fmt ":
            sr, ch = _parse_fmt(data, off, size)
        elif fourcc == b"data":
            pcm = data[off:off + size]
    if sr is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    frame = ch * 2
    if len(pcm) % frame:
        raise ValueError("data chunk is not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, ch)
    return sr, samples.astype(np.int16)


def sniff_wav(data: bytes) -> dict:
    """Header-walk metadata without reading a single sample: sample
    rate, channels, frame count (from the data chunk's LENGTH), and the
    embedded LIST/INFO/ICMT comment. Cost is O(#chunks), not O(bytes) —
    the audit pass a 100 TB audio table runs before any decode."""
    chunks = _walk_riff(data)
    sr = ch = None
    n_samples = None
    comment = None
    for fourcc, off, size in chunks:
        if fourcc == b"fmt ":
            sr, ch = _parse_fmt(data, off, size)
        elif fourcc == b"data":
            n_samples = size  # frames resolved below once ch is known
        elif fourcc == b"LIST" and data[off:off + 4] == b"INFO":
            pos = off + 4
            while pos + 8 <= off + size:
                sub = data[pos:pos + 4]
                sub_size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
                if pos + 8 + sub_size > off + size:
                    raise ValueError("INFO sub-chunk overruns LIST")
                if sub == b"ICMT":
                    comment = (
                        data[pos + 8:pos + 8 + sub_size]
                        .rstrip(b"\x00")
                        .decode("utf-8", "replace")
                    )
                pos += 8 + sub_size + (sub_size % 2)
    if sr is None or n_samples is None:
        raise ValueError("missing fmt or data chunk")
    return {
        "sr": sr,
        "channels": ch,
        "n_samples": n_samples // (ch * 2),
        "comment": comment,
    }


def _zero_crossings(x: np.ndarray) -> int:
    """Sign-boundary crossings on channel 0 (boundary at <0 vs >=0 —
    one fixed convention so oracles reproduce it exactly)."""
    neg = x < 0
    return int(np.count_nonzero(neg[:-1] != neg[1:]))


def clip_features(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(sq_sum, abs_sum, peak, zero_crossings) over (n, ch) int16 —
    all integer-exact (int16² ≤ 2³⁰; clips are ≪ 2³³ samples, so the
    int64 accumulators cannot overflow)."""
    wide = samples.astype(np.int64)
    return (
        int((wide * wide).sum()),
        int(np.abs(wide).sum()),
        int(np.abs(wide).max()) if wide.size else 0,
        _zero_crossings(samples[:, 0]) if samples.size else 0,
    )


FEATURES_SCHEMA = (
    "audio_id string, sr int, channels int, n_samples int, "
    "sq_sum bigint, abs_sum bigint, peak int, zero_crossings int, "
    "decode_error string"
)


def audio_features(df: DataFrame, decoder=decode_wav) -> DataFrame:
    """Per-clip integer features from the decoded PCM: total energy
    (sum of squares), mean-abs numerator, peak amplitude, channel-0
    zero crossings. ``decoder`` is the production seam for compressed
    containers (soundfile/ffmpeg), exactly like decode_images' codec
    seam."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    sr, samples = decoder(bytes(data))
                except Exception as exc:  # noqa: BLE001 — isolate bad rows
                    rows.append(
                        (aid, None, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
                    continue
                sq, ab, pk, zc = clip_features(samples)
                rows.append(
                    (aid, sr, samples.shape[1], samples.shape[0],
                     sq, ab, pk, zc, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sr", "channels", "n_samples", "sq_sum",
                    "abs_sum", "peak", "zero_crossings", "decode_error",
                ],
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


WINDOWS_SCHEMA = (
    "audio_id string, win_idx int, start int, sq_sum bigint, peak int, "
    "zero_crossings int, decode_error string"
)


def sample_audio_windows(
    df: DataFrame, win: int = 256, hop: int = 512, decoder=decode_wav
) -> DataFrame:
    """One row per FULL analysis window: window w covers channel-0
    samples [w·hop, w·hop+win); trailing partial windows are dropped
    (fixed semantics the oracle replays). ``hop`` controls the row
    explosion the way ``every_k`` does for video frames."""
    if win < 1 or hop < 1:
        raise ValueError(f"win and hop must be >= 1, got {win}, {hop}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    _sr, samples = decoder(bytes(data))
                except Exception as exc:  # noqa: BLE001 — isolate bad rows
                    rows.append(
                        (aid, None, None, None, None, None, str(exc)[:200])
                    )
                    continue
                mono = samples[:, 0]
                for w in range((len(mono) - win) // hop + 1):
                    seg = mono[w * hop:w * hop + win]
                    wide = seg.astype(np.int64)
                    rows.append(
                        (
                            aid, w, w * hop, int((wide * wide).sum()),
                            int(np.abs(wide).max()),
                            _zero_crossings(seg), None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "win_idx", "start", "sq_sum", "peak",
                    "zero_crossings", "decode_error",
                ],
            )

    return df.mapInPandas(batches, schema=WINDOWS_SCHEMA)
