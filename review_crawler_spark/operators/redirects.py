"""Redirect-chain resolution: map every URL to its final (terminal) URL.

The reference resolves redirect chains one blocking HTTP hop at a time —
``check_if_doi_resolves`` follows dx.doi.org through to the landing page
(/root/reference/rarticle.py:784-800) and Scrapy's RedirectMiddleware
re-enqueues each 3xx hop. At crawl scale the fetched log instead yields a
TABLE of redirect edges (src_url -> dst_url from 3xx responses), and the
frontier wants the transitive closure: admit / mark-seen the *canonical
terminal* of a chain, not every intermediate hop.

Scale shape — pointer doubling (path halving), not per-hop iteration:

* the edge set is first made functional (one outgoing edge per src,
  deterministic ``min(dst)`` tie-break — real 3xx responses have one
  Location header; duplicates come from refetches),
* round k squares the mapping table (``M' = M ∘ M``), so after r rounds
  ``M`` sends every src up to 2^r hops forward — a chain of length L
  resolves in O(log L) rounds of plain equi-joins, each shuffling O(V)
  rows on one key, with ``localCheckpoint`` pinning lineage so plans
  stay O(1) per round (same discipline as operators/components.py).
  The per-url state IS the mapping (state₀ = M₀ = the functional edge
  set with hops/d = 1, and both advance by composing with Mₖ, so
  stateₖ = Mₖ by induction) — one squared table per round, not a
  state-advance join plus a mapping-square join,
* cycles (a→b→a, self-loops) and chains longer than ``max_hops`` can
  never reach a terminal: after the fixed ``ceil(log2(max_hops))+1``
  rounds they still point at a node with an outgoing edge and are
  reported ``resolved=false`` instead of looping forever.

Output: one row per distinct src URL — (url, final_url, hops, resolved),
with ``final_url=''``/``hops=-1`` for unresolved rows so the frame stays
null-free for downstream hashing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_hops: int = 32,
) -> DataFrame:
    """Transitive closure of a redirect edge table (see module docstring)."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    f = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    # mapping: from `a` you reach `b` in `d` hops (doubles every round).
    # The per-url state (url, cur, hops) is this same relation — both start
    # as the functional edge set with one hop taken and both advance by
    # composing with the current mapping, so squaring the mapping ALSO
    # advances every chain (round-6 optimization: the old shape ran a
    # second, provably-identical state-advance join per round).
    # lazy checkpoints: each round's LogicalRDD keeps the SQL plan flat
    # (round N never replans rounds 1..N-1, and the self-join's two
    # references resolve to ONE persisted RDD), while no round runs its
    # own driver action — the whole O(log L) squaring chain executes as
    # one job when the caller's action fires (round-6: the eager variant
    # paid one scheduling round trip per round; at log-bounded round
    # counts the lineage is O(log max_hops) regardless of data size)
    mapping = f.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(1).alias("d")
    ).localCheckpoint(eager=False)

    rounds = max(1, math.ceil(math.log2(max_hops)) + 1)
    for _ in range(rounds):
        m2 = mapping.select(
            F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("d").alias("d2")
        )
        mapping = (
            mapping.join(m2, mapping["b"] == m2["a2"], "left")
            .select(
                "a",
                F.coalesce("b2", "b").alias("b"),
                (F.col("d") + F.coalesce("d2", F.lit(0))).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    state = mapping.select(
        F.col("a").alias("url"), F.col("b").alias("cur"), F.col("d").alias("hops")
    )

    # terminal iff cur has no outgoing edge; bounded by max_hops
    srcs = f.select(F.col("src").alias("cur_src"))
    done = (
        state.join(srcs, state["cur"] == srcs["cur_src"], "left")
        .select(
            "url",
            "cur",
            "hops",
            (F.col("cur_src").isNull() & (F.col("hops") <= F.lit(max_hops))).alias(
                "resolved"
            ),
        )
    )
    return done.select(
        "url",
        F.when(F.col("resolved"), F.col("cur")).otherwise(F.lit("")).alias(
            "final_url"
        ),
        F.when(F.col("resolved"), F.col("hops"))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("hops"),
        "resolved",
    )
