"""Perceptual image near-dup: planted ``~dup`` figures are recovered by
phash banding with exact recall, distinct figures stay apart.

The generator invariants these tests pin (diversified control-grid base
pattern, ±6 dup jitter) are what make phash dedup meaningful on the
synthetic corpus — see `sources/images_table.py:_base_pixels`.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from review_crawler_spark.operators import dedup as D
from review_crawler_spark.sources.images_table import images_df, make_image


def _ids(n_base: int = 24, n_dup: int = 8) -> list[str]:
    bases = [f"journals.plos.org/plosone/fig-{i:03d}" for i in range(n_base)]
    return bases + [f"{b}~dup1" for b in bases[:n_dup]]


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dup_convention_yields_near_hashes():
    for i in range(12):
        base = f"x/fig-{i}"
        a = make_image(base)
        b = make_image(f"{base}~dup1")
        # same geometry/format (seed comes from the base id)...
        assert (a["w"], a["h"], a["fmt"]) == (b["w"], b["h"], b["fmt"])
        # ...different bitstream (the jitter really is applied)...
        if a["fmt"] != "gif":  # gif palette quantization may absorb ±6
            assert a["bytes"] != b["bytes"]
        # ...but perceptually adjacent
        assert _hamming(a["phash"], b["phash"]) <= 6


def test_distinct_images_are_phash_separated():
    hs = [make_image(f"y/fig-{i}")["phash"] for i in range(24)]
    dmin = min(_hamming(a, b) for a, b in itertools.combinations(hs, 2))
    assert dmin >= 5  # banding threshold 4 can never pair two distinct figures


def test_phash_near_pairs_exact_recall(spark):
    ids = _ids()
    imgs = images_df(spark, ids).select("image_id", "phash")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.phash_near_pairs(imgs, max_hamming=4).collect()
    }
    hs = {i: make_image(i)["phash"] for i in ids}
    want = {
        tuple(sorted((a, b))): _hamming(hs[a], hs[b])
        for a, b in itertools.combinations(ids, 2)
        if _hamming(hs[a], hs[b]) <= 4
    }
    normalized = {tuple(sorted(k)): v for k, v in got.items()}
    assert normalized == want
    assert len(want) >= 6  # the corpus really plants recoverable dups


def test_dup_pixels_stay_close_and_decodable():
    base = make_image("z/fig-7")
    dup = make_image("z/fig-7~dup1")
    diff = np.abs(
        base["_pixels"].astype(int) - dup["_pixels"].astype(int)
    ).max()
    # ±6 jitter, then (for gif) palette quantization — bounded either way
    assert diff <= 40
    assert base["caption"] != dup["caption"]  # ids differ → captions differ


@pytest.mark.parametrize("budget", [0, 2, 4])
def test_generic_hamming_budget_monotone(spark, budget):
    imgs = images_df(spark, _ids(12, 6)).select("image_id", "phash")
    n = D.hamming_near_pairs(imgs, "image_id", "phash", budget).count()
    n_full = D.hamming_near_pairs(imgs, "image_id", "phash", 7).count()
    assert n <= n_full


def test_phash_clusters_match_union_find(spark):
    """Spark (banding pairs → label propagation) vs pure-Python
    (brute-force pairs → union-find): identical clustering, sizes, and
    canonical picks — including singletons."""
    from review_crawler_spark.operators.components import connected_components
    from review_crawler_spark.operators.dedup import phash_near_pairs

    ids = _ids(16, 8) + [f"{b}~dup2" for b in _ids(4, 0)]
    hs = {i: make_image(i)["phash"] for i in ids}

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if _hamming(hs[a], hs[b]) <= 4:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    groups: dict[str, list[str]] = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    want = {}
    for members in groups.values():
        canon = min(members)
        for m in members:
            want[m] = (canon, len(members), m == canon)
    assert any(sz > 1 for _, sz, _ in want.values())  # dups really cluster

    from pyspark.sql import functions as F

    imgs = images_df(spark, ids).select("image_id", "phash")
    comp = connected_components(
        phash_near_pairs(imgs, max_hamming=4), src="id_a", dst="id_b"
    )
    sizes = comp.groupBy(F.col("component").alias("comp")).agg(
        F.count("*").alias("sz")
    )
    got = {
        r["image_id"]: (r["cluster_id"], r["cluster_size"], r["is_canon"])
        for r in (
            imgs.join(comp, imgs.image_id == comp.id, "left")
            .select(
                "image_id",
                F.coalesce("component", "image_id").alias("cluster_id"),
            )
            .join(sizes, F.col("cluster_id") == F.col("comp"), "left")
            .select(
                "image_id",
                "cluster_id",
                F.coalesce("sz", F.lit(1)).cast("int").alias("cluster_size"),
                (F.col("image_id") == F.col("cluster_id")).alias("is_canon"),
            )
            .collect()
        )
    }
    assert got == want
