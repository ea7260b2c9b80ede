"""Pixel-stat quality gating: scalar-reference equality + gate semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from review_crawler_spark.functions.imgquality import (
    image_quality_stats,
    luma_int,
    quality_stats_of,
    with_quality_verdict,
)
from review_crawler_spark.sources.images_table import images_df, make_image

IDS = [f"www.mdpi.com/article/{n}/fig1" for n in range(24)]


def scalar_stats(pixels: np.ndarray, edge_thr: int = 16) -> dict:
    """Independent scalar-loop reference (no shared numpy expressions)."""
    h, w = pixels.shape[:2]
    luma = [[0] * w for _ in range(h)]
    s = sq = sat = edges = 0
    bins = set()
    for y in range(h):
        for x in range(w):
            r, g, b = int(pixels[y, x, 0]), int(pixels[y, x, 1]), int(pixels[y, x, 2])
            lv = (77 * r + 150 * g + 29 * b) // 256
            luma[y][x] = lv
            s += lv
            sq += lv * lv
            sat += max(r, g, b) - min(r, g, b)
            bins.add(lv // 16)
    for y in range(h):
        for x in range(1, w):
            if abs(luma[y][x] - luma[y][x - 1]) > edge_thr:
                edges += 1
    return {
        "n_px": h * w, "luma_sum": s, "luma_sumsq": sq, "sat_sum": sat,
        "edge_count": edges, "luma_bins": len(bins),
    }


def test_quality_stats_match_scalar_reference():
    rng = np.random.default_rng(11)
    for _ in range(5):
        px = rng.integers(0, 256, size=(9, 13, 3)).astype(np.uint8)
        assert quality_stats_of(px) == scalar_stats(px)


def test_luma_int_range():
    px = np.full((2, 2, 3), 255, dtype=np.uint8)
    assert luma_int(px).max() == 255
    assert luma_int(np.zeros((2, 2, 3), dtype=np.uint8)).min() == 0


def test_distributed_stats_match_generator_pixels(spark):
    """End-to-end over REAL encoded payloads: for lossless formats the
    decoded pixels are the generator's, so distributed counters equal the
    scalar reference over make_image pixels."""
    imgs = images_df(spark, IDS).filter(F.col("fmt") != "jpeg")
    got = {
        r["image_id"]: (r["n_px"], r["luma_sum"], r["luma_sumsq"],
                        r["sat_sum"], r["edge_count"], r["luma_bins"])
        for r in image_quality_stats(imgs).collect()
    }
    checked = 0
    for i in IDS:
        rec = make_image(i)
        if rec["fmt"] == "jpeg":
            continue
        want = scalar_stats(rec["_pixels"])
        assert got[i] == (
            want["n_px"], want["luma_sum"], want["luma_sumsq"],
            want["sat_sum"], want["edge_count"], want["luma_bins"],
        ), i
        checked += 1
    assert checked >= 5


def test_jpeg_rows_decode_and_count(spark):
    """JPEG is lossy (no pixel ground truth) but must still decode and
    produce plausible counters through the same pass."""
    imgs = images_df(spark, IDS).filter(F.col("fmt") == "jpeg")
    rows = image_quality_stats(imgs).collect()
    assert rows and all(r["decode_error"] is None and r["n_px"] > 0 for r in rows)


def test_corrupt_payload_quarantined(spark):
    df = spark.createDataFrame(
        [("bad1", bytearray(b"\x89PNG\r\n\x1a\nnot-a-real-png"))],
        "image_id string, bytes binary",
    )
    row = image_quality_stats(df).collect()[0]
    assert row["decode_error"] is not None and row["n_px"] == 0


def test_verdict_gate_semantics(spark):
    """Crafted counters: each gate trips exactly on its own signal."""
    rows = [
        # (id, n, sum, sumsq, sat, edges, bins, err)
        ("ok", 100, 12000, 2000000, 3000, 30, 8, None),        # all pass
        ("dark", 100, 1000, 2000000, 3000, 30, 8, None),       # brightness lo
        ("blown", 100, 24000, 6000000, 3000, 30, 8, None),     # brightness hi
        ("flat", 100, 12000, 1440500, 3000, 30, 8, None),      # var = 5 < 25
        ("grey", 100, 12000, 2000000, 100, 30, 8, None),       # saturation
        ("blur", 100, 12000, 2000000, 3000, 1, 8, None),       # edges
        ("banded", 100, 12000, 2000000, 3000, 30, 2, None),    # bins
        ("corrupt", 0, 0, 0, 0, 0, 0, "bad"),                  # decode
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, n_px long, luma_sum long, luma_sumsq long, "
        "sat_sum long, edge_count long, luma_bins int, decode_error string",
    )
    got = {r["image_id"]: r for r in with_quality_verdict(df).collect()}
    assert got["ok"]["passes"]
    for bad in ("dark", "blown", "flat", "grey", "blur", "banded", "corrupt"):
        assert not got[bad]["passes"], bad
    assert not got["dark"]["gate_bright"]
    assert not got["flat"]["gate_contrast"]
    assert not got["grey"]["gate_sat"]
    assert not got["blur"]["gate_edges"]
    assert not got["banded"]["gate_bins"]


def test_verdict_is_partitioning_invariant(spark):
    imgs = images_df(spark, IDS)
    base = with_quality_verdict(image_quality_stats(imgs))
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in with_quality_verdict(
        image_quality_stats(imgs.repartition(7))).collect()}
    assert a == b
