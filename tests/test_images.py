"""Image payload invariants (BASELINE.json input_hint):
- decoded-pixel allclose: PSNR ≥ 40 dB for lossy formats, exact for lossless
- exact caption equality vs the reference extraction
- phash reproduced bit-for-bit by the decode UDF
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from review_crawler_spark.functions import images as I
from review_crawler_spark.sources.images_table import images_df, make_image

IDS = [f"www.mdpi.com/article/{n}/fig{f}.png" for n in range(20) for f in (1, 2)]


def test_codec_roundtrip_psnr():
    for image_id in IDS[:12]:
        row = make_image(image_id)
        decoded, fmt = I.decode_image(row["bytes"])
        assert fmt == row["fmt"]
        assert decoded.shape == (row["h"], row["w"], 3)
        p = I.psnr(row["_pixels"], decoded)
        if row["fmt"] in ("png", "gif"):
            # png lossless; gif lossless over its palette-bound source
            assert np.array_equal(row["_pixels"], decoded), (
                f"{row['fmt']} must be lossless"
            )
        else:
            assert p >= 40.0, f"{row['fmt']} PSNR {p:.1f} < 40 dB"


def test_decode_udf_matches_reference(spark):
    table = images_df(spark, IDS)
    decoded = I.decode_images(table)
    joined = decoded.alias("d").join(
        table.select("image_id", F.col("phash").alias("ref_phash"),
                     F.col("caption").alias("ref_caption")),
        "image_id",
    )
    rows = joined.collect()
    assert len(rows) == len(IDS)
    for r in rows:
        assert r["decode_error"] is None
        assert r["pixels_ok"]
        assert r["phash"] == r["ref_phash"], r["image_id"]
        assert r["caption"] == r["ref_caption"]


def test_decode_udf_isolates_bad_bytes(spark):
    import pandas as pd

    good = make_image(IDS[0])
    pdf = pd.DataFrame(
        {
            "image_id": [IDS[0], "bad/img"],
            "bytes": [good["bytes"], b"not an image"],
            "w": [good["w"], 1],
            "h": [good["h"], 1],
            "fmt": [good["fmt"], "png"],
            "caption": [good["caption"], "x"],
            "phash": [good["phash"], 0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["image_id"]: r for r in I.decode_images(df).collect()}
    assert out[IDS[0]]["decode_error"] is None
    assert out["bad/img"]["decode_error"] is not None  # never throws


def test_decoder_injection_seam(spark):
    """U5: decode_images takes any bytes -> (pixels, fmt) decoder — proven
    with a fake third-party codec (PPM-style, not the built-in one), so a
    production PIL-backed decode_real slots in without touching the Spark
    plumbing."""
    import numpy as np

    from review_crawler_spark.functions.images import (
        average_phash,
        decode_images,
        decode_real,
    )

    def encode_ppm(px):
        h, w, _ = px.shape
        return b"P6 " + f"{w} {h} 255\n".encode() + px.tobytes()

    def decode_ppm(data):
        head, raw = data.split(b"\n", 1)
        _, w, h, _ = head.split()
        px = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w), 3)
        return px, "ppm"

    rng = np.random.default_rng(7)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        rows.append((f"img{i}", encode_ppm(px), 16, 16, "ppm", f"cap {i}",
                     average_phash(px)))
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    out = decode_images(df, decoder=decode_ppm).collect()
    assert len(out) == 8
    by_id = {r["image_id"]: r for r in out}
    for i in range(8):
        r = by_id[f"img{i}"]
        assert r["decode_error"] is None and r["pixels_ok"]
        assert r["phash"] == rows[i][6]  # lossless round trip -> exact phash
        assert r["caption"] == f"cap {i}"

    # PNG and JPEG are real codecs now; anything else is a ValueError
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_real(b"not an image at all")
    with _pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff\xe0 truncated garbage jpeg")


# ---------------------------------------------------------------- real PNG


def test_png_roundtrip_all_filter_types():
    """Pure-Python PNG codec: encode with every PNG filter type (0-4),
    decode losslessly — covers each unfilter path in decode_png."""
    from review_crawler_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for ft in range(5):
        data = encode_png(px, filter_type=ft)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = decode_png(data)
        assert np.array_equal(out, px), f"filter {ft} not lossless"


def test_png_decode_rejects_corruption():
    from review_crawler_spark.functions.png import decode_png, encode_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    data[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n short")


def test_decode_real_runs_end_to_end_on_all_real_formats(spark):
    """Round-2/3 carry-forward closed: decode_real (NOT an injected fake)
    decodes the table's real PNG, baseline-JPEG and GIF bitstreams through
    the Spark plumbing — png/gif lossless (phash exact), JPEG within the
    lossy phash/PSNR contract."""
    table = images_df(spark, IDS)
    ref = {r["image_id"]: r for r in table.collect()}
    assert {r["fmt"] for r in ref.values()} == {"png", "jpeg", "gif"}
    out = I.decode_images(table, decoder=I.decode_real).collect()
    assert len(out) == len(ref)
    for r in out:
        assert r["decode_error"] is None
        assert r["pixels_ok"]
        # stored phash was computed over decode_image's pixels, and both
        # real branches are the same codecs decode_image dispatches to
        assert r["phash"] == ref[r["image_id"]]["phash"]


# --------------------------------------------------------------- real JPEG


def test_jpeg_roundtrip_psnr_and_structure():
    """Pure-Python baseline JPEG codec: JFIF markers present, PSNR ≥ 40 dB
    at the table's quality on noisy content, flat content near-lossless."""
    from review_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    data = encode_jpeg(noisy, quality=98)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    out = decode_jpeg(data)
    assert out.shape == noisy.shape
    assert I.psnr(noisy, out) >= 40.0

    flat = np.full((24, 24, 3), 93, dtype=np.uint8)
    assert I.psnr(flat, decode_jpeg(encode_jpeg(flat, 95))) >= 48.0


def test_jpeg_decode_rejects_corruption():
    from review_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    data = encode_jpeg(px, 90)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00 not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(data[:20])  # truncated mid-segment
    # progressive SOF2 is explicitly unsupported
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)


def test_jpeg_restart_intervals_decode_identically():
    """DRI/RSTn path: restart markers at any interval must not change the
    decoded pixels (predictor resets mirror between encoder and decoder)."""
    from review_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)  # 42 MCUs
    plain = decode_jpeg(encode_jpeg(px, 95))
    for ri in (1, 4, 7, 100):
        data = encode_jpeg(px, 95, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(decode_jpeg(data), plain), f"ri={ri}"


def test_gif_lzw_roundtrips_and_corruption():
    """Pure-Python GIF87a codec: lossless over indexed pixels, including
    the 9→12-bit LZW width growth and table-full CLEAR reset; malformed
    input rejected."""
    from review_crawler_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    # noise big enough to fill the 4096-entry LZW table (CLEAR path)
    idx = rng.integers(0, 256, (128, 96)).astype(np.uint8)
    data = encode_gif(idx, pal)
    assert data[:6] == b"GIF87a" and data[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(data), pal[idx])

    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(data[:40])  # truncated LZW stream

    # palette pre-quantization is idempotent and the end-to-end gif path
    # through encode_image/decode_image is exact over quantized pixels
    px = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    qpx = I.gif_prequantize(px)
    assert np.array_equal(I.gif_prequantize(qpx), qpx)
    dec, fmt = I.decode_image(I.encode_image(qpx, "gif"))
    assert fmt == "gif" and np.array_equal(dec, qpx)


def test_decoders_reject_corruption_with_valueerror_only():
    """Seeded fuzz: truncation, bit flips, and garbage tails on real
    PNG/JPEG/GIF bitstreams must raise ValueError (the decode contract),
    never IndexError/KeyError/struct.error/OverflowError — decode_images
    isolates any exception, but decode_real's documented contract is
    ValueError on malformed input."""
    import random

    random.seed(7)
    rng = np.random.default_rng(7)
    samples = [make_image(f"fuzztest-{i}")["bytes"] for i in range(12)]
    for data in samples:
        for trial in range(25):
            b = bytearray(data)
            mode = trial % 4
            if mode == 0:
                b = b[: random.randrange(1, len(b))]
            elif mode == 1:
                b[random.randrange(len(b))] ^= random.randrange(1, 256)
            elif mode == 2:
                for _ in range(9):
                    b[random.randrange(len(b))] ^= random.randrange(1, 256)
            else:
                b = b[:16] + bytes(
                    rng.integers(0, 256, random.randrange(5, 400),
                                 dtype=np.uint8)
                )
            try:
                I.decode_image(bytes(b))
            except ValueError:
                pass  # the contract; a lucky still-valid mutation also ok


def test_jpeg_odd_sizes_and_extremes():
    """Non-multiple-of-8 sizes pad with edge replication; max-amplitude
    blocks survive the coefficient clamp at quality 100."""
    from review_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    checker = (np.indices((13, 19)).sum(0) % 2 * 255).astype(np.uint8)
    px = checker[..., None].repeat(3, 2)
    for q in (85, 100):
        out = decode_jpeg(encode_jpeg(px, q))
        assert out.shape == px.shape
        assert I.psnr(px, out) >= 30.0


def test_png_adam7_interlace_roundtrip():
    """Adam7-interlaced encodes decode losslessly, for every filter type
    and for dimensions that exercise empty / partial passes (1x1 lacks
    six of the seven passes entirely)."""
    import numpy as np

    from review_crawler_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(77)
    for h, w in ((1, 1), (2, 3), (7, 5), (8, 8), (13, 21)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in range(5):
            data = encode_png(px, filter_type=ft, interlace=True)
            assert data[8 + 8 + 12] == 1  # IHDR interlace byte
            out = decode_png(data)
            assert out.shape == px.shape
            assert (out == px).all(), (h, w, ft)


def test_png_adam7_equals_sequential_decode():
    """The same pixels through interlaced and sequential layouts decode
    to identical arrays, and the interlaced body really is reordered
    (different deflate payload)."""
    import numpy as np

    from review_crawler_spark.functions.png import decode_png, encode_png

    px = np.random.default_rng(9).integers(
        0, 256, size=(24, 17, 3), dtype=np.uint8
    )
    seq = encode_png(px, filter_type=4)
    adam = encode_png(px, filter_type=4, interlace=True)
    assert seq != adam
    assert (decode_png(seq) == decode_png(adam)).all()


def test_png_adam7_truncated_passes_raise():
    import numpy as np

    from review_crawler_spark.functions.png import decode_png, encode_png

    px = np.random.default_rng(3).integers(
        0, 256, size=(16, 16, 3), dtype=np.uint8
    )
    data = encode_png(px, interlace=True)
    # corrupt a byte inside IDAT (after the CRC-checked header): flip in
    # the deflate stream → zlib error → contract ValueError
    idx = data.index(b"IDAT") + 10
    bad = data[:idx] + bytes([data[idx] ^ 0xFF]) + data[idx + 1 :]
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_png(bad)
