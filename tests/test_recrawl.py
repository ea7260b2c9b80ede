"""Recrawl/TTL maintenance: expire_seen + enqueue.

The standing-crawl freshness story the north rule's 10^10-entry frontier
implies: URLs leave the live url_seen view on expiry and are re-fetched —
exactly once each — when re-seeded or rediscovered, under the same
politeness/ordering discipline as the original crawl. The reference's only
analog is deleting an article's JSON so its existence re-check misses
(/root/reference/plos_crawler.py:293-297).
"""

from __future__ import annotations

import pytest

from review_crawler_spark.crawler.checkpoint import SnapshotStore
from review_crawler_spark.crawler.scheduler import CrawlEngine
from review_crawler_spark.reference_sim import simulate
from review_crawler_spark.sources.sitegen import PRI_SEARCH_BASE, build_site, seeds
from review_crawler_spark.sources.site_graph import site_graph_df, site_links_df


@pytest.fixture(scope="module")
def sim_result():
    return simulate()


def _full_crawl(spark, store, seen_filter):
    site = build_site()
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
        seen_filter=seen_filter,
    )
    eng.seed(seeds())
    eng.run(max_waves=100)
    return eng


def _order(eng):
    return [
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    ]


def _seen(eng):
    return {r["canonical_url"] for r in eng.url_seen_set().collect()}


ELIFE_P3_ARTICLES = [
    f"https://elifesciences.org/article/{n}" for n in range(30, 40)
]


def _victims(base_seen):
    """elife search page 3 + its ten articles (all status-200; their
    review-report children stay live, bounding the recrawl's frontier)."""
    vs = [
        u
        for u in base_seen
        if u.endswith("page_no=3") and "elifesciences" in u
        or u in ELIFE_P3_ARTICLES
    ]
    assert len(vs) == 11, vs
    return vs


@pytest.mark.parametrize("seen_filter", ["cuckoo", "bloom"])
def test_expire_enqueue_refetches_exactly_the_expired(
    spark, tmp_path, sim_result, seen_filter
):
    """Drain the crawl, expire a search page + its articles, re-enqueue the
    search page: the continued crawl must fetch exactly the expired set,
    once each — children that stayed live must NOT be re-admitted. Works
    under both filters: cuckoo deletes fingerprints; bloom leaves them
    stale and relies on the exact-confirm join (correctness-identical)."""
    store = SnapshotStore(tmp_path / f"ckpt_{seen_filter}")
    eng = _full_crawl(spark, store, seen_filter)
    base_order = _order(eng)
    assert base_order == sim_result.fetch_order
    base_seen = _seen(eng)
    victims = _victims(base_seen)

    vdf = spark.createDataFrame([(u,) for u in victims], "canonical_url string")
    assert eng.expire_seen(vdf) == 11
    assert _seen(eng) == base_seen - set(victims)
    # idempotent: expiring already-expired URLs is a no-op
    assert eng.expire_seen(vdf) == 0

    search3 = next(u for u in victims if "search" in u)
    assert eng.enqueue([(search3, 0, PRI_SEARCH_BASE - 3)]) == 1
    # enqueue of a still-live URL is dropped by exact admission
    live_url = "https://elifesciences.org/article/0"
    assert live_url in base_seen
    assert eng.enqueue([(live_url, 1, 5)]) == 0

    eng.run(max_waves=50)
    new_order = _order(eng)
    assert new_order[: len(base_order)] == base_order, "history rewritten"
    refetched = new_order[len(base_order):]
    assert sorted(refetched) == sorted(victims), "refetch ≠ expired set"
    assert _seen(eng) == base_seen, "url_seen must converge back"


def test_expiry_and_tombstones_survive_resume(spark, tmp_path, sim_result):
    """Kill directly after expire_seen (its own manifest is the commit
    point) → a fresh engine resumes with the tombstones applied, and a
    direct enqueue of one expired article re-fetches exactly it."""
    store = SnapshotStore(tmp_path / "ckpt_exp_resume")
    eng = _full_crawl(spark, store, "cuckoo")
    base_order = _order(eng)
    base_seen = _seen(eng)
    victims = ELIFE_P3_ARTICLES[:3]  # articles 30..32; 30 has reviews
    vdf = spark.createDataFrame([(u,) for u in victims], "canonical_url string")
    assert eng.expire_seen(vdf) == 3

    site = build_site()
    eng2 = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
        seen_filter="cuckoo",
    )
    assert eng2.resume()
    assert _seen(eng2) == base_seen - set(victims), "tombstones lost on resume"

    target = ELIFE_P3_ARTICLES[0]  # has reviews → live children stay blocked
    assert eng2.enqueue([(target, 0, 50)]) == 1
    eng2.run(max_waves=20)
    new_order = _order(eng2)
    assert new_order[: len(base_order)] == base_order
    assert new_order[len(base_order):] == [target]
    assert _seen(eng2) == base_seen - set(victims[1:])


def test_seen_view_antijoin_no_exchange_after_expiry(spark, tmp_path):
    """_read_seen's tombstone anti-join must keep the zero-Exchange
    property of the plain append-log view: equi keys are exactly the
    shared bucket columns (url_hash, canonical_url), so both sides read
    through their bucketing and the epoch inequality rides along as a
    join filter — at 10^10 seen URLs the live view costs no shuffle."""
    import contextlib
    import io
    import re

    site = build_site()
    store = SnapshotStore(tmp_path / "ckpt_plan")
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
        seen_filter="cuckoo",
    )
    eng.seed(seeds())
    victim = eng.url_seen.select("canonical_url").limit(1)
    assert eng.expire_seen(victim) == 1

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eng._read_seen(eng.next_wave).explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert store.table_name("url_seen") in plan
    assert store.table_name("seen_tombstones") in plan
    assert plan.count("Bucketed: true") == 2, plan
    assert not re.findall(r"\(\d+\) Exchange", plan), plan


def test_expiry_recrawl_under_compaction(spark, tmp_path, sim_result):
    """Expire → re-enqueue → recrawl with compact_every small enough that
    the SEEN log compacts mid-recrawl: the baseline fold must preserve
    first_wave epochs (re-admitted rows survive their old tombstone), the
    tombstone/append partitions below the baseline must GC, and the
    refetched set must still be exactly the expired one."""
    store = SnapshotStore(tmp_path / "ckpt_exp_compact")
    site = build_site()
    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=store,
        num_bloom_shards=4,
        seen_filter="cuckoo",
        compact_every=3,
    )
    eng.seed(seeds())
    eng.run(max_waves=100)
    base_order = _order(eng)
    assert base_order == sim_result.fetch_order
    base_seen = _seen(eng)
    victims = _victims(base_seen)

    vdf = spark.createDataFrame([(u,) for u in victims], "canonical_url string")
    assert eng.expire_seen(vdf) == 11
    search3 = next(u for u in victims if "search" in u)
    assert eng.enqueue([(search3, 0, PRI_SEARCH_BASE - 3)]) == 1

    eng.run(max_waves=50)
    new_order = _order(eng)
    assert new_order[: len(base_order)] == base_order
    assert sorted(new_order[len(base_order):]) == sorted(victims)
    assert _seen(eng) == base_seen, "url_seen must converge back"
    # the recrawl spans ≥3 waves → at least one compaction ran after the
    # expiry; pre-base seen/tombstone partitions must be gone
    assert eng._seen_base > 0
    seen_waves = {
        int(p.name.split("=")[1])
        for p in (store.base / "url_seen").glob("w=*")
    }
    assert min(seen_waves) >= eng._seen_base - 1  # ≤1 wave of GC lag
    tomb_dir = store.base / "seen_tombstones"
    if tomb_dir.exists():
        tomb_waves = {
            int(p.name.split("=")[1]) for p in tomb_dir.glob("w=*")
        }
        assert not tomb_waves or min(tomb_waves) >= eng._seen_base - 1
