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


def test_star_variant_matches_propagation(spark):
    """large-star/small-star partitions == min-label propagation partitions
    on assorted topologies (chain, stars, parallel components, dups)."""
    from review_crawler_spark.operators.components import (
        connected_components_star,
    )

    graphs = [
        [(1, 2), (2, 3), (10, 11)],
        [(i, i + 1) for i in range(15)],              # long chain
        [(0, i) for i in range(1, 8)] + [(20, 21)],   # hub + pair
        [(2, 1), (3, 2), (5, 7), (5, 7), (9, 9)],     # dups + self-loop
    ]
    for edges in graphs:
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        prop = {
            (r["id"], r["component"])
            for r in __import__(
                "review_crawler_spark.operators.components",
                fromlist=["connected_components"],
            ).connected_components(df).collect()
        }
        star = {
            (r["id"], r["component"])
            for r in connected_components_star(df).collect()
        }
        assert star == prop, edges
