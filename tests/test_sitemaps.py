"""Sitemap source: XML parse, robots discovery, scan, seed scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.sources.sitemaps import (
    parse_sitemap_xml,
    scan_sitemaps,
    sitemap_seed_frontier,
    sitemap_urls_from_robots,
    write_sitemaps,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://m.com/a/1</loc><lastmod>2026-03-04</lastmod>
       <priority>0.80</priority></url>
  <url><loc>https://m.com/a/2</loc></url>
</urlset>"""

_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://m.com/sitemap-1.xml</loc>
           <lastmod>2026-01-01</lastmod></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    urls = parse_sitemap_xml(_URLSET)
    assert [u["loc"] for u in urls] == ["https://m.com/a/1", "https://m.com/a/2"]
    assert urls[0] == {
        "kind": "url",
        "loc": "https://m.com/a/1",
        "lastmod": "2026-03-04",
        "priority_hint": 0.8,
    }
    assert urls[1]["lastmod"] is None and urls[1]["priority_hint"] is None
    idx = parse_sitemap_xml(_INDEX)
    assert idx == [
        {
            "kind": "sitemap",
            "loc": "https://m.com/sitemap-1.xml",
            "lastmod": "2026-01-01",
            "priority_hint": None,
        }
    ]


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        parse_sitemap_xml("<urlset><url><loc>x</loc>")  # unclosed
    with pytest.raises(ValueError):
        parse_sitemap_xml("<rss></rss>")  # wrong root
    with pytest.raises(ValueError):
        parse_sitemap_xml("<urlset><url></url></urlset>")  # no loc


def test_robots_sitemap_lines():
    txt = (
        "User-agent: *\nDisallow: /tmp\n"
        "Sitemap: https://m.com/sitemap-index.xml\n"
        "sitemap: https://m.com/extra.xml  # comment\n"
    )
    assert sitemap_urls_from_robots(txt) == [
        "https://m.com/sitemap-index.xml",
        "https://m.com/extra.xml",
    ]


def test_scan_and_seed_round_trip(spark, tmp_path):
    rows = [
        (f"https://m.com/a/{i}", f"2026-02-{(i % 27) + 1:02d}", (i % 10) / 10.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "loc string, lastmod string, priority_hint double"
    ).repartition(4)
    manifest = write_sitemaps(df, str(tmp_path / "maps"))
    assert manifest.agg(F.sum("urls")).collect()[0][0] == 40

    entries = scan_sitemaps(spark, str(tmp_path / "maps"))
    by_kind = {
        r["kind"]: r["n"]
        for r in entries.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    assert by_kind["url"] == 40
    assert by_kind["sitemap"] == manifest.count()  # the index lineage rows

    seeds = {r["url"]: r for r in sitemap_seed_frontier(entries).collect()}
    assert len(seeds) == 40
    # recency dominates: later lastmod must outrank earlier regardless of hint
    lo = seeds["https://m.com/a/1"]   # 2026-02-02, hint 0.1
    hi = seeds["https://m.com/a/26"]  # 2026-02-27, hint 0.6
    assert hi["priority"] > lo["priority"]
    # same-day ties break on the publisher hint
    a = seeds["https://m.com/a/0"]    # 2026-02-01, hint 0.0
    b = seeds["https://m.com/a/27"]   # 2026-02-01, hint 0.7
    assert b["priority"] > a["priority"]
    assert str(a["lastmod_date"]) == "2026-02-01"


def test_write_escapes_query_string_urls(spark, tmp_path):
    """sitemaps.org requires entity-escaped loc values: URLs with '&'
    (query strings, which the URL canonicalizer explicitly models) must
    round-trip byte-faithfully instead of producing a urlset the reader
    rejects (round-4 ADVICE)."""
    locs = [
        "https://m.com/search?a=1&b=2",
        "https://m.com/p?q=<odd>&r='x'",
        "https://m.com/plain",
    ]
    df = spark.createDataFrame(
        [(u, "2026-03-01", 0.5) for u in locs],
        "loc string, lastmod string, priority_hint double",
    ).coalesce(1)
    write_sitemaps(df, str(tmp_path / "maps"))
    entries = scan_sitemaps(spark, str(tmp_path / "maps"))
    got = {r["loc"] for r in entries.filter(F.col("kind") == "url").collect()}
    assert got == set(locs)


def test_seed_missing_fields_score_floor(spark):
    entries = spark.createDataFrame(
        [("m", "url", "https://m.com/x", None, None)],
        "sitemap string, kind string, loc string, lastmod string, "
        "priority_hint double",
    )
    r = sitemap_seed_frontier(entries).collect()[0]
    assert r["priority"] == 0 and r["lastmod_date"] is None
