"""Crawler-trap detection (operators/traps.py) — template masking vs a
pure-Python re.sub reference, gate semantics, and the frontier-side
no-shuffle plan of trap_filter."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from review_crawler_spark.operators.traps import (
    trap_filter,
    trap_stats,
    url_template,
)


def py_template(url: str) -> str:
    t = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]*", "", url)
    t = re.sub(r"=[^&#]*", "=*", t)
    t = re.sub(r"[0-9a-fA-F]{8,}", "{H}", t)
    return re.sub(r"[0-9]+", "{N}", t)


URLS = [
    "https://ex.org/article/123",
    "https://ex.org/cal?year=2024&month=11",
    "http://ex.org/session/deadbeefcafe1234/view",
    "https://ex.org/about/team",
    "https://ex.org/",
    "https://ex.org/p?q=hello#frag",
    "https://ex.org/tag/abc9",
    "https://ex.org/2024/01/02/post-title",
]


def test_url_template_matches_python_reference(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["u"])
    got = {
        r["u"]: r["t"]
        for r in df.select("u", url_template(F.col("u")).alias("t")).collect()
    }
    for u in URLS:
        assert got[u] == py_template(u), u
    # spot-check the interesting shapes explicitly
    assert got["https://ex.org/article/123"] == "/article/{N}"
    assert got["https://ex.org/cal?year=2024&month=11"] == "/cal?year=*&month=*"
    assert (
        got["http://ex.org/session/deadbeefcafe1234/view"]
        == "/session/{H}/view"
    )
    assert got["https://ex.org/about/team"] == "/about/team"


def _frontier(spark):
    """One host: 60 calendar-trap URLs, 30 static URLs (no variable axis),
    5 rare hex URLs. A second tiny host shares the /cal template but is
    below min_urls."""
    rows = []
    for i in range(60):
        rows.append(("a.org", f"https://a.org/cal?d={19000 + i}"))
    for _ in range(30):
        rows.append(("a.org", "https://a.org/about/team"))
    for i in range(5):
        rows.append(("a.org", f"https://a.org/s/{'%08x' % (i + 0xABCDEF0)}"))
    for i in range(4):
        rows.append(("b.org", f"https://b.org/cal?d={i}"))
    return spark.createDataFrame(rows, ["host", "canonical_url"])


def test_trap_stats_gates(spark):
    stats = {
        (r["host"], r["template"]): r
        for r in trap_stats(_frontier(spark), min_urls=50,
                            min_host_pct=25).collect()
    }
    cal = stats[("a.org", "/cal?d=*")]
    assert (cal["n_urls"], cal["host_n"], cal["is_trap"]) == (60, 95, 1)
    # dominant but no variable axis → not a trap
    assert stats[("a.org", "/about/team")]["is_trap"] == 0
    # variable axis but rare (5/95 < 25%) → not a trap
    assert stats[("a.org", "/s/{H}")]["is_trap"] == 0
    # same template, other host: below min_urls → not a trap
    assert stats[("b.org", "/cal?d=*")]["is_trap"] == 0


def test_trap_filter_drops_only_trap_urls(spark):
    fr = _frontier(spark)
    kept = trap_filter(fr, min_urls=50, min_host_pct=25)
    assert kept.columns == fr.columns
    urls = [r["canonical_url"] for r in kept.collect()]
    assert len(urls) == 95 + 4 - 60
    assert not any("/cal?" in u and "a.org" in u for u in urls)
    assert sum("b.org" in u for u in urls) == 4


def _trap_site():
    """One host: the seed fans out to 12 calendar-trap links (one shared
    /cal?d=* template) and 3 article links (below any min_urls gate)."""
    from review_crawler_spark.sources.sitegen import Page

    host = "www.mdpi.com"
    seed_url = f"https://{host}/search?page_no=0"
    links = []
    for d in range(12):
        links.append((f"https://{host}/cal?d={d}", d, 10))
    for n in range(3):
        links.append((f"https://{host}/article/{n}", 12 + n, 100))
    site = {seed_url: Page(seed_url, host, "search", 0, 1, links)}
    for u, _idx, _pri in links:
        site[u] = Page(u, host, "article")
    return site, seed_url


def _drive(spark, tmp_path, trap_gate: bool) -> set[str]:
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine
    from review_crawler_spark.sources.site_graph import (
        site_graph_df,
        site_links_df,
    )

    site, seed_url = _trap_site()
    eng = CrawlEngine(
        spark,
        site_graph_df(spark, site),
        site_links_df(spark, site),
        SnapshotStore(str(tmp_path / f"gate{trap_gate}")),
        robots_rules={},
        num_bloom_shards=2,
        trap_gate=trap_gate,
        trap_min_urls=5,
        trap_min_host_pct=50,
    )
    eng.seed([(seed_url, 0, 1000)])
    eng.run(max_waves=10)
    return {
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    }


def test_engine_trap_gate_prunes_trap_template(spark, tmp_path):
    gated = _drive(spark, tmp_path, trap_gate=True)
    # the dominant /cal?d=* template never enters the frontier; the rare
    # /article/{N} template (3 urls < min_urls=5) survives
    assert not any("/cal?" in u for u in gated)
    assert sum("/article/" in u for u in gated) == 3
    ungated = _drive(spark, tmp_path, trap_gate=False)
    assert sum("/cal?" in u for u in ungated) == 12
    assert gated == {u for u in ungated if "/cal?" not in u}


def _slowburn_site():
    """A hub chain that drips 3 calendar URLs per wave: no single wave's
    batch reaches min_urls=8, but the cumulative admitted evidence does
    by the third hub — the slow-burn trap shape a wave-local gate cannot
    catch."""
    from review_crawler_spark.sources.sitegen import Page

    host = "www.plos.org"
    pages: dict = {}
    hubs = [f"https://{host}/hub/{i}" for i in range(7)]
    for i, hu in enumerate(hubs):
        links = [f"https://{host}/cal?d={3 * i + j}" for j in range(3)]
        links.append(f"https://{host}/art/{i}")
        if i + 1 < len(hubs):
            links.append(hubs[i + 1])
        pages[hu] = Page(
            hu, host, "article",
            out_links=[(u, j, 10) for j, u in enumerate(links)],
        )
        for u in links:
            if u not in pages:
                pages[u] = Page(u, host, "article")
    return pages, hubs[0]


def _drive_slowburn(spark, tmp_path, cumulative: bool):
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine
    from review_crawler_spark.sources.site_graph import (
        site_graph_df,
        site_links_df,
    )

    site, seed_url = _slowburn_site()
    store = SnapshotStore(str(tmp_path / f"cum{cumulative}"))
    eng = CrawlEngine(
        spark,
        site_graph_df(spark, site),
        site_links_df(spark, site),
        store,
        robots_rules={},
        budget=50,
        num_bloom_shards=2,
        trap_gate=True,
        trap_min_urls=8,
        trap_min_host_pct=50,
        trap_cumulative=cumulative,
    )
    eng.seed([(seed_url, 0, 1000)])
    eng.run(max_waves=25)
    urls = [
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    ]
    return urls, store


def test_engine_cumulative_gate_catches_slow_burn_trap(spark, tmp_path):
    wave_local, _ = _drive_slowburn(spark, tmp_path, cumulative=False)
    cum, store = _drive_slowburn(spark, tmp_path, cumulative=True)
    # wave-local: 3 cal urls per batch never reach min_urls=8 — all 21 crawl
    assert sum("/cal?" in u for u in wave_local) == 21
    # cumulative: admitted evidence crosses 8 after the third hub; later
    # cal admissions are gated while the hub chain itself completes
    n_cal_cum = sum("/cal?" in u for u in cum)
    assert 8 <= n_cal_cum < 21
    assert sum("/hub/" in u for u in cum) == 7
    assert sum("/hub/" in u for u in wave_local) == 7
    # the evidence log is a per-wave delta table in the store
    assert (store.base / "trap_counts").exists()


def test_cumulative_trap_log_compacts_with_identical_gating(
    spark, tmp_path
):
    """With compact_every set, the evidence log folds into a baseline on
    the frontier's cadence and older partitions are GC'd one wave later
    — the gated crawl set must be identical to the uncompacted run, and
    the partition count must stay bounded instead of one-per-wave."""
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine
    from review_crawler_spark.sources.site_graph import (
        site_graph_df,
        site_links_df,
    )

    site, seed_url = _slowburn_site()
    kw = dict(
        robots_rules={}, budget=50, num_bloom_shards=2, trap_gate=True,
        trap_min_urls=8, trap_min_host_pct=50, trap_cumulative=True,
    )
    graph, links = site_graph_df(spark, site), site_links_df(spark, site)

    plain_store = SnapshotStore(str(tmp_path / "plain"))
    plain = CrawlEngine(spark, graph, links, plain_store, **kw)
    plain.seed([(seed_url, 0, 1000)])
    n_waves = len(plain.run(max_waves=25))
    expect = sorted(
        r["canonical_url"] for r in plain.crawl_order().collect()
    )

    comp_store = SnapshotStore(str(tmp_path / "compacted"))
    comp = CrawlEngine(
        spark, graph, links, comp_store, compact_every=3, **kw
    )
    comp.seed([(seed_url, 0, 1000)])
    comp.run(max_waves=25)
    got = sorted(r["canonical_url"] for r in comp.crawl_order().collect())
    assert got == expect

    plain_parts = len(list((plain_store.base / "trap_counts").glob("w=*")))
    comp_parts = len(list((comp_store.base / "trap_counts").glob("w=*")))
    # uncompacted: ~one partition per admitting wave; compacted: bounded
    # by the compaction window (+1 for a just-written baseline)
    assert comp_parts < plain_parts
    assert comp_parts <= 4
    assert n_waves >= 6


def test_cumulative_trap_evidence_survives_kill_resume(spark, tmp_path):
    """The evidence log is store-backed: a crawl killed mid-way and
    resumed by a FRESH engine keeps gating on the accumulated counts —
    the resumed run must end with the same gated crawl set as an
    uninterrupted one."""
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine
    from review_crawler_spark.sources.site_graph import (
        site_graph_df,
        site_links_df,
    )

    site, seed_url = _slowburn_site()
    kw = dict(
        robots_rules={}, budget=50, num_bloom_shards=2, trap_gate=True,
        trap_min_urls=8, trap_min_host_pct=50, trap_cumulative=True,
    )
    graph, links = site_graph_df(spark, site), site_links_df(spark, site)

    store_a = SnapshotStore(str(tmp_path / "uninterrupted"))
    eng_a = CrawlEngine(spark, graph, links, store_a, **kw)
    eng_a.seed([(seed_url, 0, 1000)])
    eng_a.run(max_waves=25)
    expect = sorted(
        r["canonical_url"] for r in eng_a.crawl_order().collect()
    )

    store_b = SnapshotStore(str(tmp_path / "killed"))
    eng_b = CrawlEngine(spark, graph, links, store_b, **kw)
    eng_b.seed([(seed_url, 0, 1000)])
    eng_b.run(max_waves=4)  # "crash" mid-crawl, after evidence accrued
    eng_c = CrawlEngine(spark, graph, links, store_b, **kw)
    assert eng_c.resume()
    eng_c.run(max_waves=25)
    got = sorted(r["canonical_url"] for r in eng_c.crawl_order().collect())
    assert got == expect


def test_trap_filter_plan_broadcasts_dim_no_frontier_shuffle(spark):
    fr = _frontier(spark)
    plan = trap_filter(fr)._jdf.queryExecution().executedPlan().toString()
    head = plan.split("BroadcastExchange", 1)[0]
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the probe (frontier) side above the broadcast must not shuffle
    assert "Exchange hashpartitioning" not in head


def test_standing_soak_full_store_partitions_bounded(spark, tmp_path):
    """Long-soak standing crawl with every log engaged (frontier, url_seen,
    bloom, trap_counts) and compact_every=3: across >=3 compaction cycles
    the per-log partition count must stay bounded by the compaction window
    (baseline + window appends + pre-GC overlap), NOT grow one-per-wave
    (round-4 VERDICT task 4 — extends the trap-log compaction test to the
    full store)."""
    from pyspark.sql import functions as F

    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine

    hosts, per_host, budget = 2, 400, 12
    n = hosts * per_host
    urls = spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % hosts).cast("string"),
            F.lit(".example.org/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.col("id").alias("seq"),
        F.lit(1).cast("long").alias("priority"),
    )
    graph = urls.select(
        "url", F.lit("article").alias("kind"), F.lit(200).alias("status")
    )
    # each seeded page links to one FRESH url (id + n, outside the seeded
    # space, 404 on fetch) so every wave keeps ADMITTING new discoveries —
    # exercising the trap evidence log — while the standing seed backlog
    # keeps the frontier live the whole soak
    links = urls.select(
        F.col("url").alias("page_url"),
        F.concat(
            F.lit("https://h"), (F.col("seq") % hosts).cast("string"),
            F.lit(".example.org/p/"),
            (F.col("seq") + n).cast("string"),
        ).alias("link_url"),
        F.lit(1).alias("link_pri"),
        F.lit(0).alias("link_idx"),
    )
    rules = {f"h{i}.example.org": ((), None) for i in range(hosts)}
    compact_every = 3
    store = SnapshotStore(str(tmp_path / "soak"))
    eng = CrawlEngine(
        spark, site_graph=graph, site_links=links, store=store,
        budget=budget, robots_rules=rules, num_bloom_shards=4,
        compact_every=compact_every, trap_gate=True, trap_cumulative=True,
        trap_min_urls=10_000,  # gate armed but never fires on this site
    )
    eng.seed(urls)
    logs = ("frontier_log", "url_seen", "bloom_log", "trap_counts")
    bound = compact_every + 2  # window appends + baseline + pre-GC overlap
    max_parts: dict[str, int] = {name: 0 for name in logs}
    waves = 11  # compaction at waves 2, 5, 8 -> >=3 full cycles
    for w in range(waves):
        assert eng.run_wave() is not None, f"frontier drained at wave {w}"
        for name in logs:
            d = store.base / name
            if d.exists():
                max_parts[name] = max(
                    max_parts[name], len(list(d.glob("w=*")))
                )
    assert eng._frontier_base >= 3 * compact_every, "expected >=3 compactions"
    for name in logs:
        assert 0 < max_parts[name] <= bound, (
            f"{name} partitions unbounded: peak {max_parts[name]} > {bound} "
            f"over {waves} waves"
        )


def test_single_numeric_axis_template_is_exempt(spark):
    """Dominant literal-separated numeric templates (the legitimate
    article/figure shapes) must NOT be traps even far above both gates;
    adjacent /{N}/{N} date paths stay eligible. Pins the eligibility rule
    that keeps the cumulative gate a no-op on article-heavy publishers
    (the golden trap-gate-on parity test is the end-to-end witness)."""
    rows = [("p.org", f"https://p.org/article/{i}") for i in range(120)]
    rows += [
        ("p.org", f"https://p.org/article/{i}/fig{i % 3}.png")
        for i in range(120)
    ]
    rows += [
        ("p.org", f"https://p.org/archive/{i % 5}/{i % 12}/post")
        for i in range(120)
    ]
    fr = spark.createDataFrame(rows, ["host", "canonical_url"])
    stats = {
        r["template"]: r["is_trap"]
        for r in trap_stats(fr, min_urls=50, min_host_pct=25).collect()
    }
    assert stats["/article/{N}"] == 0
    assert stats["/article/{N}/fig{N}.png"] == 0
    assert stats["/archive/{N}/{N}/post"] == 1


def test_seeded_query_template_is_trusted(spark, tmp_path):
    """Seed-template trust: a SEEDED query-templated navigation family
    (paginated search — the reference's own seed shape, mdpi_spider.py:20)
    must never be gated even when it dominates discovery, while an
    un-seeded query template on the same host is still pruned."""
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine
    from review_crawler_spark.sources.sitegen import Page
    from review_crawler_spark.sources.site_graph import (
        site_graph_df,
        site_links_df,
    )

    host = "t.example.org"
    seed_url = f"https://{host}/search?page_no=0"
    links = []
    for p in range(1, 9):  # search pagination dominates the fan-out
        links.append((f"https://{host}/search?page_no={p}", p, 50))
    for d in range(6):  # un-seeded calendar trap on the same host
        links.append((f"https://{host}/cal?d={d}", 9 + d, 10))
    site = {seed_url: Page(seed_url, host, "search", 0, 1, links)}
    for u, _i, _p in links:
        site[u] = Page(u, host, "search" if "search" in u else "article")
    eng = CrawlEngine(
        spark,
        site_graph_df(spark, site),
        site_links_df(spark, site),
        SnapshotStore(str(tmp_path / "trust")),
        robots_rules={},
        num_bloom_shards=2,
        trap_gate=True,
        trap_cumulative=True,
        trap_min_urls=4,
        trap_min_host_pct=10,
    )
    eng.seed([(seed_url, 0, 1000)])
    eng.run(max_waves=6)
    order = [
        r["canonical_url"]
        for r in eng.crawl_order().select("canonical_url").collect()
    ]
    assert sum("/search?" in u for u in order) == 9  # all pagination crawled
    assert not any("/cal?" in u for u in order)  # trap still gated
