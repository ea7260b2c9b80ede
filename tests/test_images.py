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
        if row["fmt"] == "png":
            assert np.array_equal(row["_pixels"], decoded), "png must be lossless"
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
