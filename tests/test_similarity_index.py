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


def test_batch_probe_matches_per_query_and_prunes(spark, tmp_path):
    """Batch multi-query probe: per-query results equal running the
    single-query indexed search query-by-query; the index scan is
    partition-pruned to the union of probed lists."""
    from pyspark.sql import functions as F

    from review_crawler_spark.operators.similarity import (
        ann_topk_ivf_indexed_batch,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_b")
    write_ivf_index(emb, path, n_centroids=16, train_n=2000)

    queries = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    batch_df = ann_topk_ivf_indexed_batch(spark, path, queries, k=5, nprobe=4)
    got = {}
    for r in batch_df.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 6))
        )

    qrows = queries.collect()
    assert len(got) == 3
    for qr in qrows:
        single = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in ann_topk_ivf_indexed(
                spark, path, [float(x) for x in qr["query_vec"]],
                k=5, nprobe=4,
            ).collect()
        ]
        assert got[qr["query_id"]] == single, qr["query_id"]

    # scan pruned to the probed union (a strict subset of the 16 lists
    # for 3 near-identical-bucket queries at nprobe=4 ⇒ ≤ 12 < 16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        batch_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:300]
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_centroids.json")) as f:
        n_cent = len(_json.load(f)["centroids"])
    import re as _re

    m = _re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*IN \(([^)]*)\)", plan)
    if m:  # count the pruned-in bucket ids when the plan prints the IN list
        assert len(m.group(1).split(",")) < n_cent


def test_batch_probe_exhaustive_equals_brute_force(spark, tmp_path):
    """nprobe = n_centroids ⇒ the batch probe degrades to exact search:
    per-query results must equal brute-force cosine top-k."""
    from pyspark.sql import functions as F

    from review_crawler_spark.operators.similarity import (
        ann_topk_ivf_indexed_batch,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_x")
    write_ivf_index(emb, path, n_centroids=8, train_n=2000)
    queries = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    batch = ann_topk_ivf_indexed_batch(spark, path, queries, k=5, nprobe=8)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 6))
        )
    for qr in queries.collect():
        brute = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in cosine_topk(
                emb, [float(x) for x in qr["query_vec"]], k=5
            ).collect()
        ]
        assert got[qr["query_id"]] == brute


def test_ivfpq_rerank_full_equals_exact_and_prunes(spark, tmp_path):
    """IVF-PQ with nprobe=all lists and rerank=corpus must return exactly
    the brute-force top-k (PQ only orders the candidate funnel; the final
    scores are the exact cosine). With a small nprobe the plan must show
    a bucket partition filter and a codes-only ReadSchema on the ADC scan."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from review_crawler_spark.operators.similarity import (
        ann_topk_ivfpq_indexed_batch,
        cosine_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_centroids=8, m=8, ks=16, train_n=2000)

    queries = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    full = ann_topk_ivfpq_indexed_batch(
        spark, path, queries, k=5, nprobe=8, rerank=n
    )
    got = {}
    for r in full.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 6))
        )
    for qr in queries.collect():
        exact = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in cosine_topk(
                emb, [float(x) for x in qr["query_vec"]], k=5
            ).collect()
        ]
        assert got[qr["query_id"]] == exact, qr["query_id"]

    pruned = ann_topk_ivfpq_indexed_batch(
        spark, path, queries, k=5, nprobe=2, rerank=20
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # the ADC scan must NOT read the raw vectors — codes only
    scans = [seg for seg in plan.split("ReadSchema: ")[1:]]
    adc_scans = [s for s in scans if "codes" in s.split("\n", 1)[0]]
    assert adc_scans, plan
    assert all(
        "embedding" not in s.split("\n", 1)[0] for s in adc_scans
    ), "ADC scan reads raw vectors"


def test_ivfpq_recall_against_bruteforce(spark, tmp_path):
    """nprobe=4-of-8, rerank=50: recall@10 over 3 queries should be high
    (the funnel keeps the true neighbors) — pinned at >= 0.8."""
    from pyspark.sql import functions as F

    from review_crawler_spark.operators.similarity import (
        ann_topk_ivfpq_indexed_batch,
        cosine_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq_r")
    write_ivfpq_index(emb, path, n_centroids=8, m=8, ks=16, train_n=2000)
    queries = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    approx = {}
    for r in ann_topk_ivfpq_indexed_batch(
        spark, path, queries, k=10, nprobe=4, rerank=50
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qr in queries.collect():
        exact = {
            r["vec_id"]
            for r in cosine_topk(
                emb, [float(x) for x in qr["query_vec"]], k=10
            ).collect()
        }
        hits += len(exact & approx[qr["query_id"]])
        total += len(exact)
    assert hits / total >= 0.8, f"recall {hits}/{total}"
