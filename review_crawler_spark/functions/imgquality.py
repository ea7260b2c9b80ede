"""Pixel-statistic image quality gating — the LAION/DataComp-style filter
pass a multimodal training corpus runs after metadata gates.

Metadata gates (format, min-pixels — `image_corpus_prep`) read headers
only; this op is the one pass that must decode, and it extracts everything
a quality verdict needs in the SAME decode so the corpus is decoded once:

- ``luma_sum`` / ``luma_sumsq`` — integer BT.601 luma moments
  (brightness + contrast without ever materializing a float on the
  distributed path: mean and variance gates become integer
  cross-multiplications downstream);
- ``sat_sum`` — Σ (max(R,G,B) − min(R,G,B)): greyscale / flat-color
  detector;
- ``edge_count`` — horizontal-neighbor luma deltas > ``edge_thr``:
  blur / solid-fill detector (the integer stand-in for Laplacian
  variance);
- ``luma_bins`` — count of nonempty 16-wide luma histogram bins:
  dynamic-range / banding detector (entropy proxy with no logs, so the
  oracle matches bit-for-bit).

All counters are EXACT integers, so verdicts are reproducible across
partitionings and the DuckDB twin hashes identically.

Spark shape: one ``mapInPandas`` decode+stats pass (Arrow-batched,
per-row independent, ZERO shuffle — at 100 TB this op is embarrassingly
parallel and decode-bound); the verdict is a narrow JVM projection of
integer comparisons (`with_quality_verdict`), never a Python row op.

Reference parity: the reference crawler stores figures without any pixel
inspection (/root/reference/plos_crawler.py:190-196 writes the raw
download) — this operator is part of the training-data-pipeline surface
the task brief adds on top.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .images import decode_image

QUALITY_SCHEMA = (
    "image_id string, n_px bigint, luma_sum bigint, luma_sumsq bigint, "
    "sat_sum bigint, edge_count bigint, luma_bins int, decode_error string"
)


def luma_int(pixels: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma: (77·R + 150·G + 29·B) >> 8 — the classic
    fixed-point approximation (coefficients sum to 256). uint8 in,
    int64 out, EXACT (no float rounding to disagree on)."""
    p = pixels.astype(np.int64)
    return (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8


def quality_stats_of(pixels: np.ndarray, edge_thr: int = 16) -> dict:
    """Integer quality counters for one (h, w, 3) uint8 array."""
    luma = luma_int(pixels)
    p = pixels.astype(np.int64)
    sat = p.max(axis=2) - p.min(axis=2)
    edges = np.abs(np.diff(luma, axis=1)) > edge_thr
    hist = np.bincount((luma >> 4).ravel(), minlength=16)
    return {
        "n_px": int(luma.size),
        "luma_sum": int(luma.sum()),
        "luma_sumsq": int((luma * luma).sum()),
        "sat_sum": int(sat.sum()),
        "edge_count": int(edges.sum()),
        "luma_bins": int((hist > 0).sum()),
    }


def image_quality_stats(
    images: DataFrame, edge_thr: int = 16, decoder=None
) -> DataFrame:
    """(image_id, n_px, luma_sum, luma_sumsq, sat_sum, edge_count,
    luma_bins, decode_error) — one Arrow decode+stats pass, zero shuffle.

    ``decoder`` is the production codec seam (defaults to the pure-Python
    real codecs); rows whose payload fails to decode survive with
    ``decode_error`` set and zeroed counters, so a corrupt shard never
    kills the corpus pass — the verdict stage quarantines them.
    """
    dec = decoder or decode_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
                row = {
                    "image_id": image_id, "n_px": 0, "luma_sum": 0,
                    "luma_sumsq": 0, "sat_sum": 0, "edge_count": 0,
                    "luma_bins": 0, "decode_error": None,
                }
                try:
                    pixels, _fmt = dec(bytes(data))
                    row.update(quality_stats_of(pixels, edge_thr=edge_thr))
                except (ValueError, NotImplementedError) as exc:
                    row["decode_error"] = str(exc)[:200]
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "n_px", "luma_sum", "luma_sumsq", "sat_sum",
                    "edge_count", "luma_bins", "decode_error",
                ],
            )

    return images.select("image_id", "bytes").mapInPandas(gen, QUALITY_SCHEMA)


def _cross_ge(num_sum: Column, n: Column, thr_milli: int) -> Column:
    """mean(num) ≥ thr_milli/1000 as the integer cross-multiplication
    1000·Σ ≥ thr·n — no float division on the distributed path."""
    return num_sum * 1000 >= F.lit(int(thr_milli)) * n


def with_quality_verdict(
    stats: DataFrame,
    min_brightness_milli: int = 20_000,
    max_brightness_milli: int = 235_000,
    min_variance_milli: int = 25_000,
    min_sat_milli: int = 5_000,
    min_edge_per_mille: int = 20,
    min_luma_bins: int = 3,
) -> DataFrame:
    """Append boolean gate columns + the composite ``passes`` verdict.

    Every gate is an integer cross-multiplication over the exact counters
    (the host_quality convention — bit-reproducible, shuffle-free):

    - brightness: min ≤ 1000·mean(luma) ≤ max (thresholds in milli-luma);
    - contrast:   1000²·var(luma) ≥ min_variance_milli·1000, via
      n·Σx² − (Σx)² ≥ thr·n²/1000 cross-multiplied exactly;
    - saturation: 1000·mean(sat) ≥ min_sat_milli;
    - edges:      1000·edge_count ≥ min_edge_per_mille·n_px;
    - range:      luma_bins ≥ min_luma_bins;
    - decodable:  decode_error IS NULL AND n_px > 0.

    ``passes`` = all of the above.
    """
    n = F.col("n_px")
    bright_lo = _cross_ge(F.col("luma_sum"), n, min_brightness_milli)
    bright_hi = F.col("luma_sum") * 1000 <= F.lit(int(max_brightness_milli)) * n
    # var ≥ thr/1000  ⇔  1000·(n·Σx² − (Σx)²) ≥ thr·n²  (exact int64 —
    # n_px ≤ ~10⁶ per figure keeps every product far inside 63 bits)
    contrast = (
        (n * F.col("luma_sumsq") - F.col("luma_sum") * F.col("luma_sum")) * 1000
        >= F.lit(int(min_variance_milli)) * n * n
    )
    sat = _cross_ge(F.col("sat_sum"), n, min_sat_milli)
    edges = F.col("edge_count") * 1000 >= F.lit(int(min_edge_per_mille)) * n
    bins = F.col("luma_bins") >= F.lit(int(min_luma_bins))
    decodable = F.col("decode_error").isNull() & (n > 0)
    return (
        stats.withColumn("gate_bright", decodable & bright_lo & bright_hi)
        .withColumn("gate_contrast", decodable & contrast)
        .withColumn("gate_sat", decodable & sat)
        .withColumn("gate_edges", decodable & edges)
        .withColumn("gate_bins", decodable & bins)
        .withColumn(
            "passes",
            decodable & bright_lo & bright_hi & contrast & sat & edges & bins,
        )
    )
