"""PageRank operator units: closed-form graphs, invariants, determinism."""

from __future__ import annotations

import math

import pytest

from review_crawler_spark.operators.graphrank import pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["pr"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    # symmetric graph → uniform rank regardless of damping/iters
    r = _pr(spark, [(0, 1), (1, 0)], iters=7)
    assert r[0] == pytest.approx(0.5, abs=1e-12)
    assert r[1] == pytest.approx(0.5, abs=1e-12)


def test_star_graph_closed_form(spark):
    # k leaves all pointing at a hub; hub is dangling (no out-edges).
    # One can solve the fixpoint by hand: with dangling mass M = rank(hub),
    # leaf = (1-d)/N + d*M/N  and  hub = (1-d)/N + d*(k*leaf + M/N)... the
    # test instead checks the two *structural* facts that must hold at any
    # iteration count: hub strictly dominates, leaves are exactly equal.
    k = 5
    r = _pr(spark, [(i, 99) for i in range(1, k + 1)], iters=12)
    leaves = [r[i] for i in range(1, k + 1)]
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-15)
    assert r[99] > max(leaves) * 3
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_rank_mass_conserved_with_dangling_and_self_loops(spark):
    edges = [(0, 1), (1, 2), (2, 2), (3, 0), (0, 4)]  # 4→0, 4 dangling, 2 self-loop
    r = _pr(spark, edges, iters=9)
    assert set(r) == {0, 1, 2, 3, 4}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(v > 0 for v in r.values())


def test_parallel_edges_vote_twice(spark):
    # 0 links twice to 1 and once to 2: rank(1) must exceed rank(2)
    r = _pr(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], iters=10)
    assert r[1] > r[2]


def test_zero_iters_is_uniform_and_validation(spark):
    r = _pr(spark, [(0, 1), (1, 2)], iters=0)
    assert all(v == pytest.approx(1 / 3) for v in r.values())
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(df, iters=-1)


def test_matches_numpy_power_iteration(spark):
    # deterministic pseudo-web of 60 nodes, cross-checked against a dense
    # numpy implementation of the same recurrence
    import numpy as np

    n = 60
    edges = []
    for v in range(n):
        if v % 7 == 0:
            continue  # dangling nodes
        edges.append((v, (v * 131 + 7) % n))
        edges.append((v, (v * 31 + 3) % n))
        if v % 3 == 0:
            edges.append((v, (v * 17 + 11) % n))
    d, iters = 0.85, 6
    A = np.zeros((n, n))
    deg = np.zeros(n)
    for s, t in edges:
        A[t, s] += 1.0
        deg[s] += 1.0
    out = deg > 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = A[:, out] @ (r[out] / deg[out])
        mass = r[~out].sum()
        r = (1 - d) / n + d * (contrib + mass / n)
    got = _pr(spark, edges, damping=d, iters=iters)
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-12), v
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
