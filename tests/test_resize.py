"""Batch resize op: resampler correctness, lossy-format PSNR behavior,
Spark op parity, bad-record isolation."""

from __future__ import annotations

import numpy as np
import pytest

from review_crawler_spark.functions.images import psnr
from review_crawler_spark.functions.resize import (
    resize_bilinear,
    resize_images,
    resize_nearest,
)
from review_crawler_spark.sources.images_table import images_df, make_image

IDS = [f"www.mdpi.com/article/{n}/fig1" for n in range(10)]


def _ref_nearest(px: np.ndarray, h: int, w: int) -> np.ndarray:
    sh, sw = px.shape[:2]
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            out[y, x] = px[(y * sh) // h, (x * sw) // w]
    return out


def _ref_bilinear(px: np.ndarray, h: int, w: int) -> np.ndarray:
    """Scalar-loop half-pixel-center bilinear (independent reference)."""
    sh, sw = px.shape[:2]
    src = px.astype(np.float64)
    out = np.zeros((h, w, 3), dtype=np.float64)
    for y in range(h):
        fy = (y + 0.5) * sh / h - 0.5
        y0 = min(max(int(np.floor(fy)), 0), sh - 1)
        y1 = min(y0 + 1, sh - 1)
        wy = min(max(fy - y0, 0.0), 1.0)
        for x in range(w):
            fx = (x + 0.5) * sw / w - 0.5
            x0 = min(max(int(np.floor(fx)), 0), sw - 1)
            x1 = min(x0 + 1, sw - 1)
            wx = min(max(fx - x0, 0.0), 1.0)
            top = src[y0, x0] * (1 - wx) + src[y0, x1] * wx
            bot = src[y1, x0] * (1 - wx) + src[y1, x1] * wx
            out[y, x] = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_nearest_matches_scalar_reference():
    rng = np.random.default_rng(3)
    for sh, sw, h, w in ((17, 23, 12, 12), (8, 8, 16, 16), (30, 10, 5, 25)):
        px = rng.integers(0, 256, (sh, sw, 3)).astype(np.uint8)
        assert (resize_nearest(px, h, w) == _ref_nearest(px, h, w)).all()


def test_bilinear_matches_scalar_reference():
    rng = np.random.default_rng(5)
    for sh, sw, h, w in ((17, 23, 12, 12), (9, 14, 20, 6)):
        px = rng.integers(0, 256, (sh, sw, 3)).astype(np.uint8)
        got = resize_bilinear(px, h, w).astype(np.int64)
        ref = _ref_bilinear(px, h, w).astype(np.int64)
        # identical float path up to rint ties — allow off-by-one there
        assert np.abs(got - ref).max() <= 1
        assert (got != ref).mean() < 0.01


def test_bilinear_identity_and_constant():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (12, 15, 3)).astype(np.uint8)
    assert (resize_bilinear(px, 12, 15) == px).all()  # same-shape = identity
    flat = np.full((7, 7, 3), 131, dtype=np.uint8)
    assert (resize_bilinear(flat, 21, 3) == 131).all()


def test_downsample_preserves_content_psnr():
    # down-then-up through bilinear stays recognizably the same image
    row = make_image(IDS[0])
    px = row["_pixels"]
    h, w = px.shape[:2]
    down = resize_bilinear(px, h // 2, w // 2)
    back = resize_bilinear(down, h, w)
    assert psnr(px, back) > 20.0


def test_resize_images_spark_op(spark):
    imgs = images_df(spark, IDS)
    rows = {r.image_id: r for r in resize_images(imgs, 12, 12).collect()}
    assert len(rows) == len(IDS)
    for i in IDS:
        row = make_image(i)
        r = rows[i]
        assert r.resize_error is None and (r.h, r.w) == (12, 12)
        if row["fmt"] == "jpeg":
            # lossy decode: features exist; exactness is the PSNR gate's
            # job in test_images.py, not bit-equality here
            assert r.px_sum > 0
        else:
            exp = resize_bilinear(row["_pixels"], 12, 12)
            assert r.px_sum == int(exp.sum(dtype="int64"))


def test_resize_images_isolates_bad_records(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["junk"], "bytes": [b"nope"]})
    )
    rows = resize_images(df, 8, 8).collect()
    assert len(rows) == 1 and rows[0].resize_error is not None


def test_resize_images_rejects_bad_args(spark):
    imgs = images_df(spark, IDS[:1])
    with pytest.raises(ValueError):
        resize_images(imgs, 8, 8, method="bicubic")
    with pytest.raises(ValueError):
        resize_images(imgs, 0, 8)
