"""Distributed PageRank — link-structure priority for crawl frontiers.

The reference crawls in sitemap/recency order only (its scheduler is a
single-process Scrapy queue; priorities come from publisher sitemap depth
— /root/reference/crawling/crawling/spiders/*.py). A web-scale frontier
additionally wants a *link-structure* signal: PageRank (Page et al. 1999)
is the canonical crawl-ordering score — Cho, Garcia-Molina & Page
(WWW 1998, "Efficient crawling through URL ordering") showed
PageRank-ordered crawling finds important pages fastest. This module is
that signal as a batch operator over an edge list, usable to re-score a
standing frontier between waves (the engine's per-wave priority contract
stays golden-matched to the simulator; this is the offline re-prioritizer
a production crawl runs on the side).

Semantics (power iteration, fixed ``iters`` — deterministic, no
convergence-dependent control flow, so the DuckDB oracle can unroll the
same number of rounds):

    rank_0(v)   = 1/N
    rank_k+1(v) = (1-d)/N + d * ( Σ_{u→v} rank_k(u)/outdeg(u)
                                  + dangling_k / N )
    dangling_k  = Σ rank_k(u) over nodes u with no out-edges

Parallel edges keep their multiplicity (a page linking twice votes
twice); self-loops are ordinary edges. Σ rank = 1 is invariant at every
round (unit-tested).

Scale shape (the 10^10-node story):
- Per iteration exactly TWO data-sized shuffles: the edges⋈ranks hash
  join keyed src, and the contribution aggregation keyed dst — both
  edge-list-sized with map-side partial sums; ranks are node-sized.
- The (src, dst, outdeg) frame is pre-joined ONCE and pinned with an
  eager localCheckpoint, so no iteration recomputes the degree
  aggregation (and in production the pinned frame is a parquet table
  BUCKETED BY src — the same discipline as the engine's url_seen store —
  which deletes the join's edge-side Exchange entirely).
- The dangling mass is a 1-row aggregate broadcast back with a
  crossJoin(broadcast(·)) — never a driver round-trip inside the loop.
- Each new rank frame is localCheckpoint'd: lineage stays O(1) per
  round instead of O(iters), the same discipline as
  operators/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr) for every node appearing in ``edges``.

    ``iters`` fixed power-iteration rounds with damping ``damping``;
    dangling mass redistributed uniformly each round. Output ``pr`` sums
    to 1 over all nodes.
    """
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(1.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static across iterations: every edge with its source's out-degree
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    # nodes that emit no edges — their rank leaks and is re-spread uniformly
    sinks = nodes.join(
        outdeg, nodes["node"] == outdeg["src"], "left_anti"
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = sinks.join(ranks, "node").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("mass")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("mass") / n
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
