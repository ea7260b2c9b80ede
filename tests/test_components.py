"""Connected components (operators/components.py): graph-shape units plus
the minhash→clusters pipeline against hand-checkable topologies."""

from __future__ import annotations

from review_crawler_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        (r["id"], r["component"])
        for r in connected_components(df).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3} via chain, component {10,11}; labels = min member
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges(spark):
    # a 12-node path: worst-case diameter for min-label propagation
    got = _cc(spark, [(i, i + 1) for i in range(12)])
    assert got == {(i, 0) for i in range(13)}


def test_orientation_invariant(spark):
    # reversed edges and duplicate edges give the same partition
    fwd = _cc(spark, [(1, 2), (2, 3), (7, 5)])
    rev = _cc(spark, [(2, 1), (3, 2), (5, 7), (5, 7)])
    assert fwd == rev
    assert (5, 5) in fwd and (7, 5) in fwd


def test_dedup_clusters_on_synthetic_docs(spark):
    # 3 near-identical docs (one cluster), 2 different identical-pair docs,
    # 1 unique doc (excluded as a singleton)
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " extra"),
        (2, base + " indeed"),
        (10, "completely different text about spark and parquet files ok"),
        (11, "completely different text about spark and parquet files ok"),
        (99, "nothing like anything else entirely on its own path here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, jaccard_threshold=0.5).collect()
    }
    assert out == {
        (0, 0, 3), (1, 0, 3), (2, 0, 3),
        (10, 10, 2), (11, 10, 2),
    }
