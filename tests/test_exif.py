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


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    A padded third-party JPEG decodes fine in _decode_jpeg, so the EXIF
    walk must not quarantine it (round-4 ADVICE); trailing EOI padding
    after the last segment ends the walk cleanly."""
    for n in range(12):
        iid = f"www.elifesciences.org/pix/{n}"
        row = make_image(iid)
        if row["fmt"] != "jpeg":
            continue
        data = bytes(row["bytes"])
        # inject fill bytes before the first marker after SOI
        padded = data[:2] + b"\xff\xff\xff" + data[2:]
        assert exif_from_jpeg(padded) == image_exif_intent(iid)
    # EOI immediately after SOI (with fill padding): no APP1, not an error
    assert exif_from_jpeg(b"\xff\xd8\xff\xff\xff\xd9\x00\x00") is None


def _scalar_orient(px, o: int):
    """Independent scalar reference: map every OUTPUT coordinate to its
    input pixel per the EXIF tag-274 mapping, one assignment at a time."""
    import numpy as np

    h, w = px.shape[:2]
    oh, ow = (w, h) if o >= 5 else (h, w)
    out = np.zeros((oh, ow, 3), dtype=px.dtype)
    for y in range(oh):
        for x in range(ow):
            if o == 1:
                sy, sx = y, x
            elif o == 2:
                sy, sx = y, w - 1 - x
            elif o == 3:
                sy, sx = h - 1 - y, w - 1 - x
            elif o == 4:
                sy, sx = h - 1 - y, x
            elif o == 5:
                sy, sx = x, y
            elif o == 6:
                sy, sx = h - 1 - x, y
            elif o == 7:
                sy, sx = h - 1 - x, w - 1 - y
            else:  # 8
                sy, sx = x, w - 1 - y
            out[y, x] = px[sy, sx]
    return out


def test_auto_orient_pixels_all_eight_vs_scalar_reference():
    import numpy as np

    from review_crawler_spark.functions.exif import auto_orient_pixels

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for o in range(1, 9):
        got = auto_orient_pixels(px, o)
        ref = _scalar_orient(px, o)
        assert got.shape == ref.shape, o
        assert (np.asarray(got) == ref).all(), f"orientation {o}"
        # rotation/flip is a permutation: the integer pixel sum is exact
        assert int(np.asarray(got).astype("int64").sum()) == int(
            px.astype("int64").sum()
        )
    with pytest.raises(ValueError):
        auto_orient_pixels(px, 0)
    with pytest.raises(ValueError):
        auto_orient_pixels(px, 9)


def test_auto_orient_images_dataframe(spark):
    import numpy as np

    from review_crawler_spark.functions.exif import auto_orient_images
    from review_crawler_spark.sources.images_table import images_df

    ids = [f"www.elifesciences.org/pix/{n}" for n in range(12)]
    out = {
        r["image_id"]: r
        for r in auto_orient_images(images_df(spark, ids)).collect()
    }
    for iid in ids:
        r = out[iid]
        intent = image_exif_intent(iid)
        o = intent["orientation"] if intent else 1
        assert r["orient_error"] is None
        assert r["orientation"] == o
        if o >= 5:
            assert (r["out_w"], r["out_h"]) == (r["h"], r["w"])
        else:
            assert (r["out_w"], r["out_h"]) == (r["w"], r["h"])
        # the sum must equal the decoded image's sum exactly (permutation)
        row = make_image(iid)
        from review_crawler_spark.functions.images import decode_image

        px, _ = decode_image(bytes(row["bytes"]))
        assert r["px_sum"] == int(px.astype(np.int64).sum())


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
