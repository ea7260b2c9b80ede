"""Payload ingestion: fetched image URLs → image+caption rows (input_hint).

The reference streams binary downloads to disk
(/root/reference/plos_crawler.py:190-196, mdpi_review_spider.py:158-171);
here the fetch stage's image rows join the payload table (the sandbox
stand-in for the HTTP body) and land in a ``fetched_images`` table shaped
exactly like BASELINE.json input_hint, with the decode UDF re-verifying
pixels/phash/caption per row (U5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.images import decode_images


def image_id_of(url_col):
    """Canonical image URL → image_id (host/path, scheme stripped)."""
    return F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://", "")


def ingest_payloads(fetched: DataFrame, images: DataFrame) -> DataFrame:
    """fetched rows (kind='image') ⋈ payload table → fetched_images.

    Join key is image_id; the payload side is typically the larger table at
    scale, so the join shuffles on image_id (both sides pruned to the wave's
    image subset first — predicate pushdown keeps the scan narrow).
    """
    image_rows = fetched.filter(F.col("kind") == "image").select(
        image_id_of(F.col("canonical_url")).alias("image_id"),
        "canonical_url", "host", "wave",
    )
    return image_rows.join(images, "image_id", "inner")


def verify_payloads(fetched_images: DataFrame) -> DataFrame:
    """Re-decode every fetched payload and attach the invariant columns:
    phash_match (exact) and decode status. Callers assert phash_match and
    pixel PSNR invariants in tests; at scale this runs as a sampled audit."""
    decoded = decode_images(
        fetched_images.select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        )
    ).select(
        F.col("image_id").alias("d_image_id"),
        F.col("phash").alias("recomputed_phash"),
        "pixels_ok", "decode_error",
    )
    return fetched_images.join(
        decoded, fetched_images.image_id == decoded.d_image_id
    ).select(
        "image_id", "host", "wave", "fmt", "caption",
        "phash", "recomputed_phash",
        (F.col("phash") == F.col("recomputed_phash")).alias("phash_match"),
        "pixels_ok", "decode_error",
    )
