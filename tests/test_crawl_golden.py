"""Golden crawl tests: the Spark engine must reproduce the pure-Python
reference simulator exactly — crawl order, URL-seen set, politeness.

This is the SURVEY.md §5 plan item 2 ("crawl-order & URL-seen golden
tests") and the heart of the north rule's correctness clause.
"""

from __future__ import annotations

import pytest

from review_crawler_spark.crawler.checkpoint import SnapshotStore
from review_crawler_spark.crawler.scheduler import CrawlEngine
from review_crawler_spark.reference_sim import host_budget, simulate
from review_crawler_spark.sources.sitegen import ROBOTS_RULES, build_site, seeds
from review_crawler_spark.sources.site_graph import site_graph_df, site_links_df


@pytest.fixture(scope="module")
def sim_result():
    return simulate()


@pytest.fixture(scope="module")
def engine_result(spark, tmp_path_factory):
    site = build_site()
    store = SnapshotStore(tmp_path_factory.mktemp("ckpt"))
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
    )
    eng.seed(seeds())
    eng.run(max_waves=100)
    order = [
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    ]
    seen = {r["canonical_url"] for r in eng.url_seen_set().collect()}
    fetched_rows = eng.crawl_order().collect()
    return eng, order, seen, fetched_rows


def test_url_seen_matches(sim_result, engine_result):
    _, _, seen, _ = engine_result
    assert seen == sim_result.url_seen


def test_crawl_order_matches(sim_result, engine_result):
    _, order, _, _ = engine_result
    assert order == sim_result.fetch_order


def test_politeness_budget_never_exceeded(engine_result):
    """For every (wave, host): fetched+errored ≤ budget (mirrors the
    reference's politeness unit test, /root/reference/tests/test_utils.py:56-59)."""
    eng, _, _, fetched_rows = engine_result
    per = {}
    for r in fetched_rows:
        per[(r["wave"], r["host"])] = per.get((r["wave"], r["host"]), 0) + 1
    for (_, host), n in per.items():
        assert n <= host_budget(host)


def test_no_robots_disallowed_fetches(engine_result):
    _, order, seen, _ = engine_result
    assert not any("/private/" in u for u in order)
    assert not any("/private/" in u for u in seen)


def test_no_duplicate_fetches(engine_result):
    _, order, _, _ = engine_result
    assert len(set(order)) == len(order)


def test_bloom_off_equivalence(spark, tmp_path, sim_result):
    """Bloom is a pure prefilter: disabling it must not change results."""
    site = build_site()
    store = SnapshotStore(tmp_path / "ckpt_nobloom")
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        use_bloom=False,
    )
    eng.seed(seeds())
    eng.run(max_waves=100)
    order = [
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    ]
    assert order == sim_result.fetch_order
