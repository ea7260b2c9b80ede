"""Robots rules as broadcast-joinable dimension tables.

The reference disables robots (`ROBOTSTXT_OBEY = False`,
/root/reference/crawling/crawling/settings.py:20 — note the `# :)`), but the
north rule makes robots a first-class toggle. Rules are parsed once per host
(hosts number in the thousands, not billions) into two tiny tables that
broadcast-join against the frontier:

- ``disallow(host, prefix)`` — path-prefix bans, applied at frontier insert;
- ``budgets(host, budget)`` — crawl-delay-derived per-wave fetch budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_robots_txt(text: str, default_budget: int, wave_seconds: float = 4.0) -> tuple[list[str], int]:
    """Parse a (toy) robots.txt body → (disallow prefixes, per-wave budget).

    Crawl-delay d seconds → at most wave_seconds/d fetches per politeness
    wave (floor, min 1). Only the ``*`` user-agent group is honored, which
    matches the reference's single-UA behavior.
    """
    prefixes: list[str] = []
    budget = default_budget
    active = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key == "disallow" and val:
            prefixes.append(val)
        elif active and key == "crawl-delay":
            try:
                delay = float(val)
                if delay > 0:
                    budget = max(1, min(default_budget, int(wave_seconds / delay)))
                else:
                    budget = default_budget  # 'Crawl-delay: 0' = no throttle
            except ValueError:
                pass
    return prefixes, budget


def rules_tables(
    spark: SparkSession,
    rules: dict[str, tuple[tuple[str, ...], int | None]],
    default_budget: int,
) -> tuple[DataFrame, DataFrame]:
    """Materialize {host: (prefixes, budget|None)} → (disallow_df, budgets_df)."""
    dis_rows = [
        (host, p) for host, (prefixes, _) in rules.items() for p in prefixes
    ]
    bud_rows = [
        (host, int(b) if b is not None else int(default_budget))
        for host, (_, b) in rules.items()
    ]
    disallow = spark.createDataFrame(
        dis_rows or [("", "")], "host string, prefix string"
    ).filter(F.col("host") != "")
    budgets = spark.createDataFrame(
        bud_rows or [("", 0)], "host string, budget int"
    ).filter(F.col("host") != "")
    return disallow, budgets


def filter_allowed(candidates: DataFrame, disallow: DataFrame) -> DataFrame:
    """Drop rows whose canonical path starts with a disallowed prefix.

    The per-host prefix lists are pre-aggregated into a tiny array-valued
    dim, broadcast-joined, and checked with ``exists`` — one broadcast, no
    shuffle and no row duplication on the frontier side.
    """
    dis_agg = disallow.groupBy("host").agg(F.collect_list("prefix").alias("_prefixes"))
    path = F.regexp_replace(F.col("canonical_url"), r"^[a-z][a-z0-9+.-]*://[^/]+", "")
    joined = candidates.join(F.broadcast(dis_agg), "host", "left")
    banned = F.when(
        F.col("_prefixes").isNotNull(),
        F.exists("_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~banned).drop("_prefixes")
