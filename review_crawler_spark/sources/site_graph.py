"""Materialize the synthetic web as Spark DataFrames.

Test scale: build the pure-Python site dict and createDataFrame it (the
fetch stage is then a relational join frontier ⋈ site_graph — no network).
Bench scale: generate a messy synthetic frontier distributively with pure
column expressions over ``spark.range`` (no Python per row, no driver-side
materialization) so throughput numbers reflect engine cost, not datagen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SITE_GRAPH_SCHEMA
from .sitegen import DEFAULT_HOSTS, Page, build_site


def site_graph_df(spark: SparkSession, site: dict[str, Page] | None = None) -> DataFrame:
    site = site if site is not None else build_site()
    rows = [
        (
            p.url,
            p.host,
            p.kind,
            p.page_no,
            p.total_pages,
            [(u, int(idx)) for u, idx, _ in p.out_links],
            p.status,
            p.pub_year,
            p.has_reviews,
        )
        for p in site.values()
    ]
    return spark.createDataFrame(rows, SITE_GRAPH_SCHEMA)


def site_links_df(spark: SparkSession, site: dict[str, Page] | None = None) -> DataFrame:
    """Flat link table (page_url, link_url, link_idx, link_pri) — the engine
    joins fetched pages against this to discover children with priorities."""
    site = site if site is not None else build_site()
    rows = [
        (p.url, u, int(idx), int(pri))
        for p in site.values()
        for (u, idx, pri) in p.out_links
    ]
    return spark.createDataFrame(
        rows, "page_url string, link_url string, link_idx long, link_pri long"
    )


def synthetic_frontier(
    spark: SparkSession,
    n: int,
    skew_host_share: float = 0.7,
    dup_rate: float = 0.2,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed messy-URL frontier for benchmarking (scales to any n).

    ~skew_host_share of URLs land on the single MDPI host (the reference's
    single-domain skew); dup_rate of rows duplicate an earlier URL modulo
    canonicalization noise (uppercase host, fragments, unsorted query
    params) so the canonicalize→hash→dedup path does real work.
    """
    hosts = [h for h, _, _ in DEFAULT_HOSTS]
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    hseq = (
        F.when(F.rand(seed=7) < skew_host_share, F.lit(0))
        .otherwise((F.col("id") % (len(hosts) - 1) + 1).cast("int"))
    )
    host = F.element_at(F.array(*[F.lit(h) for h in hosts]), hseq + 1)
    base_num = F.when(
        F.rand(seed=11) < dup_rate, (F.col("id") / 2).cast("long")
    ).otherwise(F.col("id"))
    noisy_host = F.when(F.col("id") % 3 == 0, F.upper(host)).otherwise(host)
    frag = F.when(F.col("id") % 5 == 0, F.lit("#sec1")).otherwise(F.lit(""))
    query = F.when(F.col("id") % 4 == 0, F.lit("?utm=z&b=2&a=1")).otherwise(F.lit(""))
    return df.select(
        F.concat(
            F.lit("https://"), noisy_host, F.lit("/article/"),
            base_num.cast("string"), query, frag,
        ).alias("url"),
        (F.pmod(F.xxhash64(base_num), F.lit(100)) + 15).cast("long").alias("priority"),
        F.lit(2).alias("depth"),
        F.col("id").alias("seq"),
    )
