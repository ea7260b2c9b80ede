"""Persisted IVF index: partition-pruned probes + parity with the
non-indexed IVF search."""

from __future__ import annotations

import contextlib
import io

from review_crawler_spark.operators.similarity import (
    ann_topk_ivf,
    ann_topk_ivf_indexed,
    write_ivf_index,
)


def _query(dim=16):
    return [((i * 37 + 11) % 19 - 9) / 10.0 for i in range(dim)]


def test_indexed_matches_unindexed_and_prunes(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = _query(dim)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_centroids=16, train_n=2000)

    direct = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ann_topk_ivf(emb, q, k=10, n_centroids=16, nprobe=4).collect()
    ]
    indexed_df = ann_topk_ivf_indexed(spark, path, q, k=10, nprobe=4)
    indexed = [
        (r["vec_id"], round(r["cosine"], 9)) for r in indexed_df.collect()
    ]
    assert indexed == direct

    # the probe is a partition filter: the scan must prune to nprobe lists
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
