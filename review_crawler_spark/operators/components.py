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

import warnings

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
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    label_t = dict(labels.dtypes)["label"]
    converged = False
    for it in range(max_iters):
        # candidate labels: own label + every neighbor's label, keep min.
        # The old label rides along as ``own`` (max over {old, nulls} = old,
        # every id contributes its own row exactly once), so convergence is
        # an observe() metric computed INSIDE the checkpoint job — zero
        # extra jobs per round (round 6; previously a separate 1-row agg
        # job re-read the checkpointed blocks every round)
        from pyspark.sql import Observation

        via_nbr = (
            sym.join(labels, sym.t == labels.id)
            .select(
                F.col("s").alias("id"), "label",
                F.lit(None).cast(label_t).alias("own"),
            )
        )
        obs = Observation(f"cc_changed_{it}")
        new_labels = (
            labels.select("id", "label", F.col("label").alias("own"))
            .unionByName(via_nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("own").alias("own"))
            .observe(
                obs,
                F.sum((F.col("label") != F.col("own")).cast("int")).alias("c"),
            )
            # eager: the observe metric needs an action anyway, and
            # materializing via the checkpoint job keeps lineage flat
            .localCheckpoint(eager=True)
        )
        changed = obs.get["c"]
        labels = new_labels.select("id", "label")
        if not changed:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after {max_iters} iterations"
            " — returned labels may be unconverged (raise max_iters or use"
            " connected_components_star)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14): the
    adversarial-graph variant of :func:`connected_components`.

    Min-label propagation needs diameter-many rounds — fine for dense
    near-dup clusters, pathological for a 10^9-node chain. Star operations
    contract the graph toward a forest of depth-1 stars in O(log² n)
    rounds regardless of diameter:

    - large-star: for each edge (u, v) with v > u, link v to the minimum
      neighbor-or-self of u — strictly-larger nodes re-hang under their
      neighborhood's minimum;
    - small-star: for each edge with v ≤ u, link v to the minimum — ties
      the small side into the same star.

    Each star round is one groupBy-min + one join over the directed edge
    list (the same shuffle shape as a propagation round, but round count
    is O(log² n) instead of O(diameter)); convergence = the undirected
    edge set reaches a fixpoint (a forest of depth-1 stars rooted at
    component minima). Output matches connected_components exactly (tests
    pin equality on assorted topologies)."""

    def directed(e: DataFrame) -> DataFrame:
        """Both orientations of an undirected pair list: each edge is then
        processed from both endpoints' perspectives, which is what lets a
        star round emit only its 'moved' side without losing edges."""
        return (
            e.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .distinct()
        )

    def mins_of(d: DataFrame) -> DataFrame:
        """m(u) = min(Γ(u) ∪ {u})."""
        with_self = d.unionByName(
            d.select("u").distinct().withColumn("v", F.col("u"))
        )
        return with_self.groupBy("u").agg(F.min("v").alias("m"))

    def large_star(e: DataFrame) -> DataFrame:
        d = directed(e)
        j = d.join(mins_of(d), "u")
        # (v, m(u)) for strictly larger neighbors; the v ≤ u orientation of
        # every edge is handled when the edge is processed from its other
        # endpoint
        return (
            j.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    def small_star(e: DataFrame) -> DataFrame:
        d = directed(e)
        dd = d.filter(F.col("v") <= F.col("u"))
        with_self = dd.unionByName(
            d.select("u").distinct().withColumn("v", F.col("u"))
        )
        mins = with_self.groupBy("u").agg(F.min("v").alias("m"))
        hang = with_self.join(mins, "u").select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        return (
            hang.filter(F.col("a") != F.col("b"))
            .distinct()
            # eager: forced immediately by the round's signature collect
            # (same trade as the propagation loop's per-round checkpoint)
            .localCheckpoint(eager=True)
        )

    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # node universe BEFORE dropping self-loops: a pure (x, x) edge still
    # names x as a (singleton) component member
    all_nodes = (
        directed(raw).select(F.col("u").alias("id")).distinct()
        .localCheckpoint(eager=False)
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        e = small_star(large_star(e))
        # set fixpoint signature: count + order-insensitive hash checksum
        sig = tuple(
            e.agg(
                F.count("*").alias("n"),
                # decimal sum: a long sum of 64-bit hashes overflows ANSI
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        warnings.warn(
            f"connected_components_star: edge set did not reach a fixpoint"
            f" after {max_rounds} rounds — returned labels may be"
            " unconverged (raise max_rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    # fixpoint edges are (member, root); roots map to themselves
    labels = e.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    algorithm: str = "propagation",
) -> DataFrame:
    """Near-duplicate CLUSTERS: minhash+LSH verified pairs → connected
    components → (doc_id, cluster_id, cluster_size). cluster_id is the
    smallest doc id in the group (the canonical survivor under a
    keep-min-id policy); only documents with at least one near-duplicate
    appear (singletons are their own trivial cluster and are left out of
    the output, like the pair operators). ``algorithm`` picks the
    components engine: "propagation" (O(diameter) rounds — the default;
    near-dup clusters are dense) or "star" (large-star/small-star,
    O(log² n) rounds — the adversarial-topology path); both produce the
    identical partition."""
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
    cc = (
        connected_components_star
        if algorithm == "star"
        else connected_components
    )
    comps = cc(pairs, "id_a", "id_b")
    sizes = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return comps.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )
