"""Header-walk metadata extraction: sniff without decode, embedded
comments in all three real formats, Spark op, bad-record isolation."""

from __future__ import annotations

import numpy as np
import pytest

from review_crawler_spark.functions.imgmeta import sniff_images, sniff_meta
from review_crawler_spark.functions.jpeg import encode_jpeg
from review_crawler_spark.functions.png import encode_png
from review_crawler_spark.sources.images_table import images_df, make_image

IDS = [f"www.mdpi.com/article/{n}/fig1" for n in range(12)]


def test_sniff_matches_generator_intent():
    for i in IDS:
        row = make_image(i)
        fmt, w, h, comment = sniff_meta(row["bytes"])
        assert (fmt, w, h) == (row["fmt"], row["w"], row["h"])
        assert comment == f"figure {i}"


def test_sniff_never_decodes_pixels():
    # corrupt every byte of the PNG IDAT payload (past the 8-byte sig +
    # IHDR + tEXt headers) — a decoder would raise; the sniffer must not
    row = next(r for r in map(make_image, IDS) if r["fmt"] == "png")
    data = bytearray(row["bytes"])
    idat = bytes(data).index(b"IDAT")
    data[idat + 4 : idat + 20] = b"\x00" * 16  # trash compressed stream
    fmt, w, h, _ = sniff_meta(bytes(data))
    assert (fmt, w, h) == ("png", row["w"], row["h"])


def test_sniff_plain_payloads_have_no_comment():
    px = np.zeros((8, 10, 3), dtype=np.uint8)
    assert sniff_meta(encode_png(px)) == ("png", 10, 8, None)
    assert sniff_meta(encode_jpeg(px, 95))[:3] == ("jpeg", 10, 8)
    assert sniff_meta(encode_jpeg(px, 95))[3] is None


def test_sniff_rejects_garbage():
    with pytest.raises(ValueError):
        sniff_meta(b"definitely not an image")


def test_sniff_images_spark_op(spark):
    rows = sniff_images(images_df(spark, IDS)).collect()
    assert len(rows) == len(IDS)
    expected = {i: make_image(i) for i in IDS}
    for r in rows:
        exp = expected[r.image_id]
        assert r.sniff_error is None
        assert (r.fmt, r.w, r.h) == (exp["fmt"], exp["w"], exp["h"])
        assert r.comment == f"figure {r.image_id}"


def test_sniff_images_isolates_bad_records(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["junk"], "bytes": [b"\x00\x01"]})
    )
    rows = sniff_images(df).collect()
    assert len(rows) == 1
    assert rows[0].sniff_error is not None and rows[0].fmt is None


def test_sniff_jpeg_fill_bytes_and_short_headers():
    # T.81 B.1.1.2: optional 0xFF fill bytes before a marker are legal —
    # third-party encoders emit them; both the sniffer and the decoder
    # must walk past them
    from review_crawler_spark.functions.jpeg import decode_jpeg

    rng = np.random.default_rng(7)
    px = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    enc = encode_jpeg(px, comment="cap")
    filled = enc[:2] + b"\xff\xff" + enc[2:]
    assert sniff_meta(filled) == sniff_meta(enc)
    assert np.array_equal(decode_jpeg(filled), decode_jpeg(enc))
    # truncated headers surface as the documented ValueError, never a raw
    # struct.error/IndexError escaping to callers that follow the contract
    for junk in (b"GIF87a\x01\x02", b"\x89PNG\r\n\x1a\n\x00\x00",
                 b"\xff\xd8\xff"):
        with pytest.raises(ValueError):
            sniff_meta(junk)
