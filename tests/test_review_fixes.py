"""Regression tests for round-1 code-review findings."""

from __future__ import annotations

from review_crawler_spark.crawler.checkpoint import SnapshotStore
from review_crawler_spark.crawler.robots import parse_robots_txt
from review_crawler_spark.crawler.scheduler import CrawlEngine
from review_crawler_spark.functions.urls import canonicalize_one
from review_crawler_spark.sources.site_graph import site_graph_df, site_links_df
from review_crawler_spark.sources.sitegen import build_site, seeds


def test_reserved_escapes_stay_distinct():
    """%26 in a query value must not merge with a literal '&' — decoding
    reserved escapes conflated distinct URLs into one url_seen identity."""
    a = canonicalize_one("https://h.org/p?a=%26b")
    b = canonicalize_one("https://h.org/p?a=&b")
    assert a != b
    assert canonicalize_one(a) == a and canonicalize_one(b) == b
    c = canonicalize_one("https://h.org/p?a=b%3Dc")
    d = canonicalize_one("https://h.org/p?a%3Db=c")
    assert c != d
    # unreserved escapes DO decode; other hex uppercases
    assert canonicalize_one("https://h.org/%41%2f") == "https://h.org/A%2F"


def test_schedule_honors_budget_override_above_default(spark, tmp_path):
    """Phase-1 salted rank capped at the engine default silently starved
    hosts whose robots budget override exceeded it."""
    site = build_site()
    rules = {"www.mdpi.com": (("/private",), 20)}  # override > default 8
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=SnapshotStore(tmp_path / "ck"),
        budget=8,
        robots_rules=rules,
        num_salts=4,
    )
    assert eng._max_budget == 20
    # 30 queued URLs on one host → exactly 20 scheduled
    from pyspark.sql import functions as F

    queued = spark.createDataFrame(
        [
            (f"https://www.mdpi.com/article/{i}", f"https://www.mdpi.com/article/{i}",
             i * 7919, "www.mdpi.com", 100, 2, 0, i, "queued", 0)
            for i in range(30)
        ],
        "url string, canonical_url string, url_hash long, host string, "
        "priority long, depth int, wave int, seq long, state string, attempt int",
    )
    assert eng._schedule(queued).count() == 20


def test_robots_crawl_delay_zero_and_garbage():
    prefixes, budget = parse_robots_txt(
        "User-agent: *\nCrawl-delay: 0\nDisallow: /x", default_budget=8
    )
    assert prefixes == ["/x"] and budget == 8
    _, budget2 = parse_robots_txt("User-agent: *\nCrawl-delay: soon", 8)
    assert budget2 == 8
    _, budget3 = parse_robots_txt("User-agent: *\nCrawl-delay: 2", 8, wave_seconds=4)
    assert budget3 == 2


def test_crawl_order_empty_store(spark, tmp_path):
    site = build_site()
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=SnapshotStore(tmp_path / "ck2"),
    )
    eng.seed(seeds())
    # no wave ever ran/committed → empty result, not a TypeError
    assert eng.crawl_order().count() == 0
