"""spark-submit entrypoint for the crawl engine.

The north rule's deployment shape (BASELINE.json): the engine runs via

    spark-submit --master <cluster> \\
        --py-files dist/review_crawler_spark.zip \\
        jobs/run_crawl.py --store /mnt/shared/crawl-state \\
        --site-graph /mnt/shared/site_graph.parquet \\
        --site-links /mnt/shared/site_links.parquet \\
        --seeds /mnt/shared/seeds.parquet --max-waves 100

``--store`` must be a shared POSIX filesystem visible to driver and
executors (NFS/EFS/Lustre): SnapshotStore is the sandbox's file-based
Iceberg stand-in — atomic-rename manifests + per-wave parquet partitions
(see crawler/checkpoint.py's seam notes). Object stores (s3://) need the
documented Iceberg-catalog swap-in, not a URI pasted into this flag.
Cluster topology (master, executor count/cores/memory, dynamic allocation)
belongs on the submit line; this script only declares the job, so the SAME
artifact runs at N and 4N executors for the scaling criterion. Build the
zip with ``python tools/make_submit_zip.py``.

Sandbox demo (no cluster, no network): ``--demo`` swaps the parquet inputs
for the synthetic golden site and runs the full wave loop locally:

    spark-submit --master 'local[8]' --py-files dist/review_crawler_spark.zip \\
        jobs/run_crawl.py --store /tmp/crawl_demo --demo
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def build_session(app: str) -> SparkSession:
    # no .master() here — spark-submit owns cluster topology
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True,
                   help="crawl-state directory (shared FS / object store)")
    p.add_argument("--site-graph",
                   help="parquet with the site_graph schema (fetch universe)")
    p.add_argument("--site-links",
                   help="parquet (page_url, link_url, link_idx, link_pri)")
    p.add_argument("--seeds",
                   help="parquet (url, seq, priority) seed rows")
    p.add_argument("--demo", action="store_true",
                   help="synthetic golden site instead of parquet inputs")
    p.add_argument("--max-waves", type=int, default=100)
    p.add_argument("--budget", type=int, default=8)
    p.add_argument("--seen-buckets", type=int, default=16)
    p.add_argument("--frontier-buckets", type=int, default=16)
    p.add_argument("--bloom-shards", type=int, default=8)
    p.add_argument("--compact-every", type=int, default=0,
                   help="fold frontier logs into a baseline every K waves")
    args = p.parse_args()

    spark = build_session("review_crawler_spark.crawl")
    # imports AFTER the session so --py-files zips resolve on executors too
    from review_crawler_spark.crawler.checkpoint import SnapshotStore
    from review_crawler_spark.crawler.scheduler import CrawlEngine

    if args.demo:
        from review_crawler_spark.sources.site_graph import (
            site_graph_df,
            site_links_df,
        )
        from review_crawler_spark.sources.sitegen import build_site, seeds

        site = build_site()
        graph, links = site_graph_df(spark, site), site_links_df(spark, site)
        seed_rows = seeds()
    else:
        if not (args.site_graph and args.site_links and args.seeds):
            p.error("--site-graph/--site-links/--seeds required unless --demo")
        graph = spark.read.parquet(args.site_graph)
        links = spark.read.parquet(args.site_links)
        seed_rows = [
            (r["url"], r["seq"], r["priority"])
            for r in spark.read.parquet(args.seeds).collect()
        ]

    eng = CrawlEngine(
        spark, graph, links, SnapshotStore(args.store),
        budget=args.budget,
        num_bloom_shards=args.bloom_shards,
        seen_buckets=args.seen_buckets,
        frontier_buckets=args.frontier_buckets,
        compact_every=args.compact_every,
    )
    if not eng.resume():
        eng.seed(seed_rows)
    eng.run(max_waves=args.max_waves)

    summary = {
        "waves": len(eng.stats),
        "fetched": int(sum(s.fetched for s in eng.stats)),
        "scheduled": int(sum(s.scheduled for s in eng.stats)),
        "new_urls": int(sum(s.new_urls for s in eng.stats)),
        "errors": int(sum(s.errors for s in eng.stats)),
        "wall_ms": int(sum(s.wall_ms for s in eng.stats)),
        "store": args.store,
    }
    print("CRAWL_SUMMARY " + json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
