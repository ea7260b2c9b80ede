"""EXIF APP1/TIFF metadata (functions/exif.py) — build/parse round trip,
both byte orders, JPEG marker-walk extraction, hardening on malformed
payloads, and the generator's embed-vs-intent equality."""

from __future__ import annotations

import struct

import pytest

from review_crawler_spark.functions.exif import (
    EXIF_SIG,
    build_exif_app1,
    exif_from_jpeg,
    extract_exif,
    parse_exif_app1,
)
from review_crawler_spark.sources.images_table import (
    image_exif_intent,
    make_image,
)

TAGS = {
    "make": "Cam-3",
    "model": "MX42",
    "datetime": "2019:07:04 12:34:56",
    "orientation": 6,
}


def test_build_parse_round_trip():
    app1 = build_exif_app1(
        TAGS["make"], TAGS["model"], TAGS["datetime"], TAGS["orientation"]
    )
    assert parse_exif_app1(app1) == TAGS


def test_partial_tags_and_inline_ascii():
    # "Zx" + NUL is 3 bytes → exercises the <=4-byte INLINE value path
    assert parse_exif_app1(build_exif_app1(make="Zx")) == {"make": "Zx"}
    assert parse_exif_app1(build_exif_app1(orientation=8)) == {
        "orientation": 8
    }
    with pytest.raises(ValueError):
        build_exif_app1(orientation=9)


def test_big_endian_parse():
    # hand-built MM TIFF: one SHORT orientation entry, value inline
    ifd = struct.pack(">H", 1)
    ifd += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 5) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    tiff = struct.pack(">2sHI", b"MM", 42, 8) + ifd
    assert parse_exif_app1(EXIF_SIG + tiff) == {"orientation": 5}


def test_malformed_payloads_raise():
    good = build_exif_app1(**{k: v for k, v in TAGS.items()
                              if k != "datetime"},
                           datetime_s=TAGS["datetime"])
    with pytest.raises(ValueError):
        parse_exif_app1(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        parse_exif_app1(good[: len(EXIF_SIG) + 4])  # truncated TIFF header
    bad_order = good[: len(EXIF_SIG)] + b"XX" + good[len(EXIF_SIG) + 2 :]
    with pytest.raises(ValueError):
        parse_exif_app1(bad_order)
    with pytest.raises(ValueError):
        parse_exif_app1(good[:-6])  # truncated IFD / value area
    with pytest.raises(ValueError):
        exif_from_jpeg(b"\x00\x00not a jpeg")


def test_generator_jpegs_carry_intent_exif():
    checked = 0
    for n in range(12):
        iid = f"www.elifesciences.org/pix/{n}"
        row = make_image(iid)
        intent = image_exif_intent(iid)
        if row["fmt"] == "jpeg":
            assert exif_from_jpeg(bytes(row["bytes"])) == intent
            checked += 1
        else:
            assert intent is None
    assert checked >= 2


def test_jfif_only_jpeg_yields_none():
    from review_crawler_spark.functions.images import encode_image
    import numpy as np

    data = encode_image(
        np.zeros((8, 8, 3), dtype=np.uint8), "jpeg", comment="c"
    )
    assert exif_from_jpeg(data) is None


def test_extract_exif_dataframe(spark):
    from review_crawler_spark.sources.images_table import images_df

    ids = [f"www.elifesciences.org/pix/{n}" for n in range(12)]
    out = {
        r["image_id"]: r
        for r in extract_exif(images_df(spark, ids)).collect()
    }
    assert len(out) == 12
    for iid in ids:
        intent = image_exif_intent(iid)
        r = out[iid]
        assert r["exif_error"] is None
        if intent is None:
            assert r["make"] is None and r["orientation"] is None
        else:
            assert r["make"] == intent["make"]
            assert r["model"] == intent["model"]
            assert r["datetime"] == intent["datetime"]
            assert r["orientation"] == intent["orientation"]
