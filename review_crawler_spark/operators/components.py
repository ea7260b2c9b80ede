"""Connected components over near-duplicate pair graphs → dedup clusters.

The dedup family (minhash/simhash/ngram/embedding — operators/dedup.py)
emits PAIRS; an actual corpus dedup needs CLUSTERS: every document labeled
with its duplicate-group id so one canonical representative survives per
group. The reference deduplicates only by exact file identity
(/root/reference/plos_crawler.py:293-297 existence checks); this is the
scale path a 100 TB training-data pipeline needs on top.

Algorithm: iterative min-label propagation — every node repeatedly adopts
the smallest label among itself and its neighbors until a fixpoint.
Per-iteration cost is one join edges⋈labels + one groupBy min (both keyed
shuffles of the EDGE LIST, never the corpus); iterations needed equal the
graph diameter, and near-dup clusters are dense (pairs come from shared
LSH buckets), so diameters are small. Each iteration ends in an eager
``localCheckpoint``: the convergence count forces the plan anyway, and the
barrier keeps lineage flat (without it iteration N replans all N-1
predecessors). For adversarial long-chain graphs at extreme scale, the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) bounds rounds by
O(log² n) — the driver loop below is the same seam; only the per-round
DataFrame expression changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable (undirected). Deterministic for any edge orientation/order."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("t"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # candidate labels: own label + every neighbor's label, keep min
        via_nbr = (
            sym.join(labels, sym.t == labels.id)
            .select(F.col("s").alias("id"), "label")
        )
        new_labels = (
            labels.unionByName(via_nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate CLUSTERS: minhash+LSH verified pairs → connected
    components → (doc_id, cluster_id, cluster_size). cluster_id is the
    smallest doc id in the group (the canonical survivor under a
    keep-min-id policy); only documents with at least one near-duplicate
    appear (singletons are their own trivial cluster and are left out of
    the output, like the pair operators)."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
    )
    comps = connected_components(pairs, "id_a", "id_b")
    sizes = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return comps.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )
