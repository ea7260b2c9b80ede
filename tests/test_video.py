"""Animated-GIF video payloads: codec round trip, frame sampling op,
metadata sniffing, and repetition-quality counters."""

from __future__ import annotations

import numpy as np
import pytest

from review_crawler_spark.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
    gif_comment,
)
from review_crawler_spark.functions.images import (
    GIF_PALETTE,
    average_phash,
    gif_index,
    gif_prequantize,
)
from review_crawler_spark.functions.imgmeta import sniff_meta
from review_crawler_spark.functions.video import sample_frames
from review_crawler_spark.sources.videos_table import (
    make_video,
    video_frames,
    videos_df,
)


def _frames(n: int = 5, h: int = 16, w: int = 20) -> np.ndarray:
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    return np.stack(
        [gif_prequantize(np.roll(base, (k, 2 * k), axis=(0, 1)))
         for k in range(n)]
    )


# ---------------------------------------------------------------- codec

def test_animation_roundtrip_lossless():
    frames = _frames()
    data = encode_gif_animation(
        np.stack([gif_index(f) for f in frames]), GIF_PALETTE
    )
    dec = decode_gif_frames(data)
    assert dec.shape == frames.shape
    assert (dec == frames).all()
    # first-frame decode agrees with the frame walker
    assert (decode_gif(data) == frames[0]).all()


def test_animation_comment_and_sniff():
    frames = _frames(3)
    data = encode_gif_animation(
        np.stack([gif_index(f) for f in frames]), GIF_PALETTE,
        comment="clip A",
    )
    assert data[:6] == b"GIF89a"
    assert gif_comment(data) == "clip A"
    assert sniff_meta(data) == ("gif", 20, 16, "clip A")


def test_animation_rejects_empty_and_bad_indices():
    with pytest.raises(ValueError):
        encode_gif_animation(
            np.zeros((0, 4, 4), dtype=np.uint8), GIF_PALETTE
        )
    bad = np.full((2, 4, 4), 250, dtype=np.uint8)  # 216-entry palette
    with pytest.raises(ValueError):
        encode_gif_animation(bad, GIF_PALETTE)


def test_malformed_animation_raises_valueerror():
    frames = _frames(2)
    data = encode_gif_animation(
        np.stack([gif_index(f) for f in frames]), GIF_PALETTE
    )
    for broken in (data[:20], data[:-10], b"GIF89a" + b"\x00" * 6):
        with pytest.raises(ValueError):
            decode_gif_frames(broken)


def test_single_frame_gif_comment_switches_to_89a():
    fr = _frames(1)[0]
    plain = encode_gif(gif_index(fr), GIF_PALETTE)
    tagged = encode_gif(gif_index(fr), GIF_PALETTE, comment="x")
    assert plain[:6] == b"GIF87a" and tagged[:6] == b"GIF89a"
    assert (decode_gif(plain) == decode_gif(tagged)).all()
    assert gif_comment(plain) is None
    assert gif_comment(tagged) == "x"


# ------------------------------------------------------------ generator

def test_make_video_lossless_and_deterministic():
    vid = "www.mdpi.com/article/7/video1"
    row = make_video(vid)
    frames = video_frames(vid)
    assert row["n_frames"] == len(frames) >= 4
    assert (decode_gif_frames(row["bytes"]) == frames).all()
    assert gif_comment(row["bytes"]) == f"video {vid}"
    again = make_video(vid)
    assert again["bytes"] == row["bytes"]


def test_video_frames_move():
    frames = video_frames("www.mdpi.com/article/9/video1")
    # motion + brightness ramp: consecutive frames differ
    assert any((frames[k] != frames[k + 1]).any()
               for k in range(len(frames) - 1))


# ---------------------------------------------------------------- spark

def test_videos_df_and_sample_frames(spark):
    ids = [f"www.mdpi.com/article/{n}/video1" for n in range(6)]
    vids = videos_df(spark, ids)
    out = sample_frames(vids, every_k=2).collect()
    assert all(r.decode_error is None for r in out)
    by_vid: dict[str, list] = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r)
    for vid in ids:
        frames = video_frames(vid)
        rows = sorted(by_vid[vid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, len(frames), 2))
        for r in rows:
            fr = frames[r.frame_idx]
            assert (r.h, r.w) == fr.shape[:2]
            assert r.px_sum == int(fr.sum(dtype="int64"))
            assert r.phash == average_phash(fr)


def test_sample_frames_isolates_bad_payloads(spark):
    import pandas as pd

    vids = spark.createDataFrame(
        pd.DataFrame({"video_id": ["bad"], "bytes": [b"not a gif"]})
    )
    rows = sample_frames(vids, every_k=1).collect()
    assert len(rows) == 1 and rows[0].decode_error is not None


def test_sample_frames_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        sample_frames(videos_df(spark, ["a"]), every_k=0)
