"""Caption–image alignment gate: verdicts, missing evidence, sniffer path."""

from __future__ import annotations

from pyspark.sql import functions as F

from review_crawler_spark.operators.alignment import (
    align_gate,
    caption_alignment_scores,
)

_COLS = "image_id string, caption string, comment string, url string"


def test_alignment_verdicts(spark):
    rows = [
        # aligned: caption repeats the figure number + 'figure'
        ("a", "Figure 17: dose response", "figure 17", "https://x.com/17/f"),
        # misaligned: caption is for another figure — only 'figure' overlaps
        ("b", "Figure 99: seismic alloy", "figure 17", "https://x.com/17/f"),
        # no evidence at all → kept (missing signal is not misalignment)
        ("c", "free-floating caption", None, None),
        # evidence present but zero overlap → dropped
        ("d", "polymer lattice", "figure 17", "https://x.com/17/f"),
    ]
    scored = caption_alignment_scores(
        spark.createDataFrame(rows, _COLS)
    ).collect()
    by = {r["image_id"]: r for r in scored}
    assert by["a"]["aligned"] and by["a"]["n_overlap"] >= 2
    assert not by["b"]["aligned"] and by["b"]["n_overlap"] == 1
    assert by["c"]["aligned"] and by["c"]["n_evidence"] == 0
    assert not by["d"]["aligned"] and by["d"]["n_overlap"] == 0
    kept = {r["image_id"] for r in align_gate(
        spark.createDataFrame(rows, _COLS)
    ).collect()}
    assert kept == {"a", "c"}


def test_alignment_counts_are_set_semantics(spark):
    # repeated tokens count once on each side
    rows = [("r", "alpha alpha beta", "alpha ALPHA gamma", "")]
    r = caption_alignment_scores(
        spark.createDataFrame(rows, _COLS)
    ).collect()[0]
    assert (r["n_caption"], r["n_evidence"]) == (2, 2)
    assert (r["n_overlap"], r["n_union"]) == (1, 3)


def test_alignment_over_real_sniffed_evidence(spark):
    """End-to-end on real encoded bitstreams: evidence comes out of the
    header-walk comment extraction, aligned captions pass, a caption
    swapped from a different article number fails."""
    from review_crawler_spark.functions.imgmeta import sniff_images
    from review_crawler_spark.sources.images_table import images_df

    ids = [f"www.mdpi.com/article/{n}/fig1" for n in (3, 4)]
    caps = spark.createDataFrame(
        [(ids[0], "Figure 3: cohort baseline"),  # aligned
         (ids[1], "Figure 3: cohort baseline")],  # caption of fig 3 on fig 4
        "image_id string, caption string",
    )
    pairs = (
        sniff_images(images_df(spark, ids).drop("caption"))
        .withColumn("url", F.concat(F.lit("https://"), "image_id"))
        .join(caps, "image_id")
    )
    by = {
        r["image_id"]: r for r in caption_alignment_scores(pairs).collect()
    }
    assert by[ids[0]]["aligned"]
    assert not by[ids[1]]["aligned"]
