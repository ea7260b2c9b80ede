"""Distributed synthetic web for engine-scale benchmarks.

Same topology as sources/sitegen.py (paginated search → articles → review
reports → images, robots traps, 403s, cross-page duplicate links) but
generated entirely with Spark column expressions over ``spark.range`` — no
driver-side dict, so it scales to millions of pages. Used by the
``engine_waves`` bench metric to measure the REAL wave loop (schedule +
fetch join + discovery + admission + checkpoint) rather than the admission
pipeline alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOSTS = ("www.mdpi.com", "journals.plos.org", "elifesciences.org")
PAGE_COUNT = 10
PRI_SEARCH_BASE = 10_000


def _host_col(hseq):
    return F.element_at(F.array(*[F.lit(h) for h in HOSTS]), hseq + 1)


def big_site_tables(
    spark: SparkSession, pages_per_host: tuple[int, int, int] = (2000, 600, 600)
) -> tuple[DataFrame, DataFrame]:
    """→ (site_graph(page_url, kind, status), site_links(page_url, link_url,
    link_idx, link_pri)) — all column-expression generated."""
    parts = spark.sparkContext.defaultParallelism
    graphs, links = [], []
    for hseq, n_pages in enumerate(pages_per_host):
        host = HOSTS[hseq]
        n_articles = n_pages * PAGE_COUNT

        pages = spark.range(0, n_pages, 1, parts).select(
            F.format_string(f"https://{host}/search?page_no=%d", F.col("id")).alias(
                "page_url"
            ),
            F.lit("search").alias("kind"),
            F.lit(200).alias("status"),
        )
        art_num = F.col("id")
        pub_year = 2015 + (art_num * 7 + hseq) % 10
        articles = spark.range(0, n_articles, 1, parts).select(
            F.format_string(f"https://{host}/article/%d", art_num).alias("page_url"),
            F.lit("article").alias("kind"),
            F.when(art_num % 53 == 17, 403).otherwise(200).cast("int").alias("status"),
        )
        reviews = (
            spark.range(0, n_articles, 1, parts)
            .filter(F.col("id") % 3 == 0)
            .select(
                F.format_string(
                    f"https://{host}/article/%d/review_report", F.col("id")
                ).alias("page_url"),
                F.lit("review_report").alias("kind"),
                F.lit(200).alias("status"),
            )
        )
        images = (
            spark.range(0, n_articles * 2, 1, parts)
            .filter((F.col("id") / 2).cast("long") % 3 == 0)
            .select(
                F.format_string(
                    f"https://{host}/article/%d/fig%d.png",
                    (F.col("id") / 2).cast("long"),
                    (F.col("id") % 2 + 1).cast("int"),
                ).alias("page_url"),
                F.lit("image").alias("kind"),
                F.lit(200).alias("status"),
            )
        )
        graphs += [pages, articles, reviews, images]

        # page0 fan-out → pages 1..P-1 (keeps BFS depth ≤ 4; the engine's
        # seq_stride must exceed the max links-per-page — callers pass
        # seq_stride ≥ n_pages + PAGE_COUNT + 2, see bench_engine_waves)
        links.append(
            spark.range(1, n_pages, 1, parts).select(
                F.lit(f"https://{host}/search?page_no=0").alias("page_url"),
                F.format_string(f"https://{host}/search?page_no=%d", F.col("id")).alias(
                    "link_url"
                ),
                (F.col("id") - 1).alias("link_idx"),
                (F.lit(PRI_SEARCH_BASE) - F.col("id")).alias("link_pri"),
            )
        )
        # page p → articles [p*10, p*10+10 (+1 overlap)) ; slot 10 = overlap
        page0_off = n_pages - 1  # page 0's article links follow its page links
        slots = spark.range(0, n_pages * (PAGE_COUNT + 1), 1, parts).select(
            (F.col("id") / (PAGE_COUNT + 1)).cast("long").alias("p"),
            (F.col("id") % (PAGE_COUNT + 1)).alias("slot"),
        )
        art = F.col("p") * PAGE_COUNT + F.col("slot")
        art_pri = 2015 + (art * 7 + hseq) % 10 - 1900
        links.append(
            slots.filter(
                (art < n_articles)
                & ((F.col("slot") < PAGE_COUNT) | (F.col("p") + 1 < n_pages))
            ).select(
                F.format_string(f"https://{host}/search?page_no=%d", F.col("p")).alias(
                    "page_url"
                ),
                F.format_string(f"https://{host}/article/%d", art).alias("link_url"),
                (
                    F.col("slot")
                    + F.when(F.col("p") == 0, F.lit(page0_off)).otherwise(F.lit(0))
                ).alias("link_idx"),
                art_pri.cast("long").alias("link_pri"),
            )
        )
        # robots-trap links (one per page, last idx)
        links.append(
            spark.range(0, n_pages, 1, parts).select(
                F.format_string(f"https://{host}/search?page_no=%d", F.col("id")).alias(
                    "page_url"
                ),
                F.format_string(f"https://{host}/private/%d", F.col("id")).alias(
                    "link_url"
                ),
                (
                    F.lit(PAGE_COUNT + 1)
                    + F.when(F.col("id") == 0, F.lit(page0_off)).otherwise(F.lit(0))
                ).alias("link_idx"),
                F.lit(1).alias("link_pri"),
            )
        )
        # article → review report
        rev = spark.range(0, n_articles, 1, parts).filter(F.col("id") % 3 == 0)
        links.append(
            rev.select(
                F.format_string(f"https://{host}/article/%d", F.col("id")).alias(
                    "page_url"
                ),
                F.format_string(
                    f"https://{host}/article/%d/review_report", F.col("id")
                ).alias("link_url"),
                F.lit(0).cast("long").alias("link_idx"),
                (2015 + (F.col("id") * 7 + hseq) % 10 - 1900).cast("long").alias(
                    "link_pri"
                ),
            )
        )
        # review → 2 images
        figs = spark.range(0, n_articles * 2, 1, parts).filter(
            (F.col("id") / 2).cast("long") % 3 == 0
        )
        links.append(
            figs.select(
                F.format_string(
                    f"https://{host}/article/%d/review_report",
                    (F.col("id") / 2).cast("long"),
                ).alias("page_url"),
                F.format_string(
                    f"https://{host}/article/%d/fig%d.png",
                    (F.col("id") / 2).cast("long"),
                    (F.col("id") % 2 + 1).cast("int"),
                ).alias("link_url"),
                (F.col("id") % 2).alias("link_idx"),
                F.lit(10).cast("long").alias("link_pri"),
            )
        )

    site_graph = graphs[0]
    for g in graphs[1:]:
        site_graph = site_graph.unionByName(g)
    site_links = links[0]
    for l in links[1:]:  # noqa: E741
        site_links = site_links.unionByName(l)
    return site_graph, site_links


def big_seeds(pages_per_host=(2000, 600, 600)) -> list[tuple[str, int, int]]:
    return [
        (f"https://{HOSTS[h]}/search?page_no=0", h, PRI_SEARCH_BASE)
        for h in range(len(pages_per_host))
    ]
