"""Large-site golden test: engine vs simulator at ~10x the small fixture.

88 search pages / 880 articles / ~1,800 fetchable URLs, budget 64 per
host per wave — exercises bigger waves (the salted two-phase top-k actually
prunes), deeper bloom growth, and many-wave checkpoint chains, with the
same exactness contract as the small golden test.
"""

from __future__ import annotations

import pytest

from review_crawler_spark.crawler.checkpoint import SnapshotStore
from review_crawler_spark.crawler.scheduler import CrawlEngine
from review_crawler_spark.reference_sim import simulate
from review_crawler_spark.sources.sitegen import build_site, seeds
from review_crawler_spark.sources.site_graph import site_graph_df, site_links_df

HOSTS = (
    ("www.mdpi.com", 0, 48),
    ("journals.plos.org", 1, 20),
    ("elifesciences.org", 2, 20),
)
# uniform robots: disallow /private everywhere, no crawl-delay throttle —
# keeps the wave count bounded at budget 64
RULES = {h: (("/private",), None) for h, _, _ in HOSTS}
BUDGET = 64


@pytest.mark.slow
def test_large_site_crawl_order_and_seen(spark, tmp_path):
    site = build_site(HOSTS)
    sim = simulate(site=site, hosts=HOSTS, budget=BUDGET, rules=RULES)
    assert len(sim.fetch_order) > 1500  # the site is actually big

    eng = CrawlEngine(
        spark,
        site_graph=site_graph_df(spark, site),
        site_links=site_links_df(spark, site),
        store=SnapshotStore(tmp_path / "ckpt_large"),
        budget=BUDGET,
        robots_rules=RULES,
        num_bloom_shards=8,
        num_salts=8,
    )
    eng.seed(seeds(HOSTS))
    eng.run(max_waves=200)

    order = [
        r["canonical_url"] for r in eng.crawl_order().select("canonical_url").collect()
    ]
    assert order == sim.fetch_order
    seen = {r["canonical_url"] for r in eng.url_seen_set().collect()}
    assert seen == sim.url_seen
