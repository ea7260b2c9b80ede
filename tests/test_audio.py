"""WAV audio payloads: container round trip, header sniff, clip and
windowed feature ops, malformed-input hardening."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from review_crawler_spark.functions.audio import (
    audio_features,
    clip_features,
    decode_wav,
    sample_audio_windows,
    sniff_wav,
)
from review_crawler_spark.sources.audio_table import (
    audio_samples,
    audios_df,
    encode_wav,
    make_audio,
)


def _pcm(n: int = 777, ch: int = 2, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)


# ---------------------------------------------------------------- codec

def test_wav_roundtrip_bit_lossless():
    samples = _pcm()
    data = encode_wav(samples, 8000, comment="hello wav")
    sr, dec = decode_wav(data)
    assert sr == 8000
    assert dec.dtype == np.int16
    assert (dec == samples).all()


def test_wav_roundtrip_mono_odd_data_pad():
    # odd data length in BYTES is impossible for 16-bit PCM, but an odd
    # ICMT comment forces the pad branch inside LIST
    samples = _pcm(n=5, ch=1)
    data = encode_wav(samples, 44100, comment="abc")  # 3+NUL → even pad
    sr, dec = decode_wav(data)
    assert sr == 44100 and (dec == samples).all()


def test_decode_skips_unknown_chunks():
    samples = _pcm(n=64, ch=1)
    data = bytearray(encode_wav(samples, 8000))
    # splice an unknown chunk right after "WAVE"
    junk = b"junk" + struct.pack("<I", 6) + b"abcdef"
    data[12:12] = junk
    data[4:8] = struct.pack("<I", struct.unpack("<I", data[4:8])[0] + len(junk))
    sr, dec = decode_wav(bytes(data))
    assert sr == 8000 and (dec == samples).all()
    assert sniff_wav(bytes(data))["n_samples"] == 64


@pytest.mark.parametrize(
    "mangle",
    [
        lambda d: d[:10],                                # truncated header
        lambda d: b"RIFX" + d[4:],                       # bad magic
        lambda d: d[:8] + b"AVI " + d[12:],              # not WAVE
        lambda d: d[:-7],                                # data chunk overrun
        lambda d: d[: len(d) - len(d) % 2 - 2],          # partial frame
    ],
)
def test_malformed_raises_valueerror(mangle):
    data = encode_wav(_pcm(n=33, ch=2), 8000)
    with pytest.raises(ValueError):
        decode_wav(mangle(data))


def test_non_pcm_fmt_rejected():
    data = bytearray(encode_wav(_pcm(n=8, ch=1), 8000))
    off = data.index(b"fmt ") + 8
    data[off:off + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        sniff_wav(bytes(data))


# ---------------------------------------------------------------- sniff

def test_sniff_matches_generator_without_decode():
    row = make_audio("www.mdpi.com/article/7/audio1")
    meta = sniff_wav(row["bytes"])
    assert meta == {
        "sr": 8000,
        "channels": row["channels"],
        "n_samples": row["n_samples"],
        "comment": "audio www.mdpi.com/article/7/audio1",
    }


# ------------------------------------------------------------- features

def test_clip_features_reference():
    samples = np.array([[3, -4], [-2, 5], [0, -1], [-7, 2]], dtype=np.int16)
    sq, ab, pk, zc = clip_features(samples)
    assert sq == sum(v * v for v in (3, -4, -2, 5, 0, -1, -7, 2))
    assert ab == 3 + 4 + 2 + 5 + 0 + 1 + 7 + 2
    assert pk == 7
    # channel 0: 3, -2, 0, -7 → boundaries (<0 vs >=0): 3|-2, -2|0, 0|-7
    assert zc == 3


def test_clip_features_int16_min_no_overflow():
    samples = np.full((4, 1), -32768, dtype=np.int16)
    sq, ab, pk, zc = clip_features(samples)
    assert sq == 4 * 32768 ** 2 and ab == 4 * 32768 and pk == 32768
    assert zc == 0


# ------------------------------------------------------------ spark ops

def _ids(n: int = 12) -> list[str]:
    return [f"www.mdpi.com/article/{k}/audio1" for k in range(n)]


def test_audio_features_match_generator(spark):
    out = {
        r["audio_id"]: r
        for r in audio_features(audios_df(spark, _ids())).collect()
    }
    assert len(out) == 12
    for aid in _ids():
        samples = audio_samples(aid)
        sq, ab, pk, zc = clip_features(samples)
        row = out[aid]
        assert row["decode_error"] is None
        assert (
            row["sr"], row["channels"], row["n_samples"],
            row["sq_sum"], row["abs_sum"], row["peak"],
            row["zero_crossings"],
        ) == (8000, samples.shape[1], samples.shape[0], sq, ab, pk, zc)


def test_windows_match_slices_and_drop_partial(spark):
    win, hop = 256, 512
    rows = sample_audio_windows(
        audios_df(spark, _ids(4)), win=win, hop=hop
    ).collect()
    by_id: dict[str, list] = {}
    for r in rows:
        by_id.setdefault(r["audio_id"], []).append(r)
    for aid in _ids(4):
        mono = audio_samples(aid)[:, 0]
        expect_n = (len(mono) - win) // hop + 1
        got = sorted(by_id[aid], key=lambda r: r["win_idx"])
        assert len(got) == expect_n
        for r in got:
            seg = mono[r["start"]:r["start"] + win].astype(np.int64)
            assert r["sq_sum"] == int((seg * seg).sum())
            assert r["peak"] == int(np.abs(seg).max())


def test_bad_payload_isolates_as_error_row(spark):
    good = audios_df(spark, _ids(2))
    corrupt = good.limit(1).selectExpr(
        "concat('broken/', audio_id) AS audio_id",
        "substring(bytes, 1, 11) AS bytes", "sr", "n_samples",
        "channels", "caption",
    )
    out = audio_features(good.unionByName(corrupt)).collect()
    errs = [r for r in out if r["decode_error"] is not None]
    assert len(errs) == 1 and errs[0]["audio_id"].startswith("broken/")
    assert all(r["sq_sum"] is not None for r in out if r not in errs)


def test_window_args_validated(spark):
    df = audios_df(spark, _ids(1))
    with pytest.raises(ValueError):
        sample_audio_windows(df, win=0)
    with pytest.raises(ValueError):
        sample_audio_windows(df, hop=0)
