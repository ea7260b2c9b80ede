"""Payload ingestion invariants: fetched image rows join the payload table;
every row re-decodes with exact phash match, exact caption, PSNR ≥ 40 dB
for lossy formats (BASELINE.json input_hint invariants)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from review_crawler_spark.crawler.payload import ingest_payloads, verify_payloads
from review_crawler_spark.functions import images as I
from review_crawler_spark.sources.images_table import images_df, make_image
from review_crawler_spark.sources.sitegen import build_site


def test_ingest_and_verify_payloads(spark):
    site = build_site()
    image_urls = [u for u, p in site.items() if p.kind == "image"][:40]
    image_ids = [u.replace("https://", "") for u in image_urls]

    fetched = spark.createDataFrame(
        [
            (u, u, i, u.split("/")[2], 3, "image", 200)
            for i, u in enumerate(image_urls)
        ],
        "url string, canonical_url string, url_hash long, host string, "
        "wave int, kind string, status int",
    )
    images = images_df(spark, image_ids)

    ingested = ingest_payloads(fetched, images)
    assert ingested.count() == len(image_urls)

    verified = verify_payloads(ingested)
    rows = verified.collect()
    assert len(rows) == len(image_urls)
    for r in rows:
        assert r["decode_error"] is None
        assert r["phash_match"], r["image_id"]
        assert r["caption"] == f"Caption for {r['image_id']}"


def test_payload_psnr_invariant_per_format():
    """Direct per-format PSNR audit of the codec over site image ids."""
    site = build_site()
    ids = [u.replace("https://", "") for u, p in site.items() if p.kind == "image"]
    seen_fmts = set()
    for image_id in ids[:60]:
        row = make_image(image_id)
        decoded, _ = I.decode_image(row["bytes"])
        seen_fmts.add(row["fmt"])
        if row["fmt"] == "png":
            assert np.array_equal(row["_pixels"], decoded)
        else:
            assert I.psnr(row["_pixels"], decoded) >= 40.0
    assert {"png", "jpeg", "gif"} <= seen_fmts
