"""Redirect-chain resolution (operators/redirects.py) vs a per-row
Python chain walker, over every chain topology a crawl sees."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from review_crawler_spark.operators.redirects import resolve_redirects


def _walk(edges: dict[str, str], max_hops: int = 32):
    out = {}
    for u in edges:
        cur, hops = edges[u], 1
        while cur in edges and hops <= max_hops:
            cur, hops = edges[cur], hops + 1
        if cur not in edges and hops <= max_hops:
            out[u] = (cur, hops, True)
        else:
            out[u] = ("", -1, False)
    return out


def _run(spark, edges: dict[str, str], max_hops: int = 32):
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edges.items()]
    )
    got = {
        r.url: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert got == _walk(edges, max_hops)
    return got


def test_chains_branches_and_terminals(spark):
    edges = {
        "a": "b", "b": "c", "c": "t1",      # 3-hop chain
        "x": "c",                            # branch joining mid-chain
        "y": "t2",                           # 1-hop
    }
    got = _run(spark, edges)
    assert got["a"] == ("t1", 3, True)
    assert got["x"] == ("t1", 2, True)
    assert got["y"] == ("t2", 1, True)


def test_cycles_self_loops_and_rho(spark):
    edges = {
        "p": "q", "q": "p",                  # 2-cycle
        "s": "s",                            # self-loop
        "tail": "p",                         # rho: chain into a cycle
        "ok": "t",
    }
    got = _run(spark, edges)
    assert got["p"] == ("", -1, False)
    assert got["s"] == ("", -1, False)
    assert got["tail"] == ("", -1, False)
    assert got["ok"] == ("t", 1, True)


def test_max_hops_bound(spark):
    # a 9-hop chain resolves at max_hops=9 but not at 8
    edges = {f"n{i}": f"n{i+1}" for i in range(9)}
    got = _run(spark, edges, max_hops=9)
    assert got["n0"] == ("n9", 9, True)
    got = _run(spark, edges, max_hops=8)
    assert got["n0"] == ("", -1, False)
    assert got["n1"] == ("n9", 8, True)


def test_long_chain_log_rounds(spark):
    # 70 hops > 2^6: exercises several doubling rounds end-to-end
    edges = {f"m{i}": f"m{i+1}" for i in range(70)}
    got = _run(spark, edges, max_hops=128)
    assert got["m0"] == ("m70", 70, True)


def test_duplicate_edges_resolve_deterministically(spark):
    df = spark.createDataFrame(
        [Row(src="a", dst="z"), Row(src="a", dst="b"), Row(src="b", dst="t")]
    )
    got = {r.url: (r.final_url, r.hops) for r in resolve_redirects(df).collect()}
    assert got["a"] == ("t", 2)  # min(dst) tie-break picks 'b'


def test_bad_max_hops(spark):
    df = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)


def test_rel_canonical_extraction_variants(spark):
    """RFC 6596 link extraction: both attribute orders, whitespace,
    case-insensitive tag, absent link -> NULL, first declaration wins."""
    from pyspark.sql import functions as F

    from review_crawler_spark.functions.html import rel_canonical

    rows = [
        ("a", '<head><link rel="canonical" href="https://x/1"/></head>'),
        ("b", '<head><link href="https://x/2" rel="canonical"/></head>'),
        ("c", '<head><LINK REL="canonical" HREF="https://x/3"/></head>'),
        ("d", "<head><title>no link</title></head>"),
        ("e", '<head><link rel="stylesheet" href="s.css"/></head>'),
        (
            "f",
            '<head><link rel="canonical" href="https://x/first"/>'
            '<link rel="canonical" href="https://x/second"/></head>',
        ),
        # intervening attributes, single quotes, unquoted values — common
        # real-page forms (round-4 ADVICE)
        (
            "g",
            '<head><link rel="canonical" type="text/html" '
            'href="https://x/7"/></head>',
        ),
        ("h", "<head><link rel='canonical' href='https://x/8'/></head>"),
        ("i", "<head><link rel=canonical href=https://x/9 /></head>"),
        (
            "j",
            '<head><link title="t" href="https://x/10" media="all" '
            'rel="canonical"/></head>',
        ),
    ]
    df = spark.createDataFrame(rows, ["id", "html"])
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", rel_canonical(F.col("html")).alias("c")
        ).collect()
    }
    assert got == {
        "a": "https://x/1",
        "b": "https://x/2",
        "c": "https://x/3",
        "d": None,
        "e": None,
        "f": "https://x/first",
        "g": "https://x/7",
        "h": "https://x/8",
        "i": "https://x/9",
        "j": "https://x/10",
    }
