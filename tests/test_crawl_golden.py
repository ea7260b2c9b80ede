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


def _run_engine(spark, store, site, max_waves=100):
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
    )
    return eng


def test_kill_resume_mid_crawl(spark, tmp_path, sim_result):
    """C7: kill after K waves → fresh engine → resume() → finish; crawl
    order and url_seen must equal the simulator exactly (the round-1 ADVICE
    noted this headline path had no direct test)."""
    site = build_site()
    store = SnapshotStore(tmp_path / "ckpt_resume")
    eng = _run_engine(spark, store, site)
    eng.seed(seeds())
    for _ in range(3):
        eng.run_wave()

    # "kill": drop the engine, build a fresh one over the same store
    eng2 = _run_engine(spark, store, site)
    assert eng2.resume() is True
    assert eng2.next_wave == 3
    eng2.run(max_waves=100)
    order = [
        r["canonical_url"]
        for r in eng2.crawl_order().select("canonical_url").collect()
    ]
    assert order == sim_result.fetch_order
    seen = {r["canonical_url"] for r in eng2.url_seen_set().collect()}
    assert seen == sim_result.url_seen


def test_resume_ignores_orphan_delta(spark, tmp_path, sim_result):
    """A crash between the url_seen delta write and the manifest publish
    leaves an orphan w=N+1 dir; resume must see only the committed prefix
    and still converge to the golden result."""
    site = build_site()
    store = SnapshotStore(tmp_path / "ckpt_orphan")
    eng = _run_engine(spark, store, site)
    eng.seed(seeds())
    for _ in range(2):
        eng.run_wave()

    # fabricate the orphan: a delta for a wave that never committed,
    # containing a poison row that must NOT surface after resume
    poison = spark.createDataFrame(
        [(999999999, "https://orphan.example/x", 99, 0)],
        "url_hash long, canonical_url string, first_wave int, partition_id int",
    )
    store.append_delta_bucketed(
        "url_seen", eng.next_wave + 1, poison,
        ("url_hash", "canonical_url"), eng.seen_buckets,
    )

    eng2 = _run_engine(spark, store, site)
    assert eng2.resume() is True
    eng2.run(max_waves=100)
    order = [
        r["canonical_url"]
        for r in eng2.crawl_order().select("canonical_url").collect()
    ]
    assert order == sim_result.fetch_order
    seen = {r["canonical_url"] for r in eng2.url_seen_set().collect()}
    assert "https://orphan.example/x" not in seen
    assert seen == sim_result.url_seen


def test_frontier_commit_is_o_delta(engine_result):
    """The working frontier holds queued rows only: it drains to empty at
    crawl end instead of accumulating every historical fetched/failed row
    (round-1 VERDICT: the per-wave full-table rewrite was the one real
    scale-killer). History lives in the per-wave fetched/failed logs."""
    eng, order, _, _ = engine_result
    last = eng.store.latest_wave()
    final_frontier = eng.store.read(eng.spark, last, "frontier")
    assert final_frontier.count() == 0  # fully drained

    # per-wave frontier sizes track the live queue, not the cumulative total
    sizes = [
        eng.store.read(eng.spark, w, "frontier").count() for w in range(last + 1)
    ]
    assert max(sizes) < len(order)  # never holds full fetch history
    # fetched logs cover every fetch exactly once (one partitioned scan —
    # fetched history is a per-wave append log, not per-wave snapshots)
    n_logged = eng.store.read_deltas(eng.spark, "fetched_log", last).count()
    assert n_logged == len(order)
