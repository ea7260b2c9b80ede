"""Recrawl prioritization from observed change rates.

The engine's recrawl maintenance (`CrawlEngine.expire_seen` / `enqueue`)
executes a recrawl decision; this operator MAKES the decision — the
freshness-policy half the reference lacks entirely (its only recrawl
trigger is a human deleting an article JSON so the existence check
misses, /root/reference/plos_crawler.py:293-297). The estimator is the
classic incremental-crawler one (Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003): treat each page's
changes as Poisson, estimate the rate from observed fetch history, and
rank pages by expected staleness — rate × time-since-last-fetch.

Relational shape (one window + one aggregation, both keyed by the page):

  changes   lag(content signal) per page over fetch history — a change is
            a fetch whose signal differs from the previous fetch's
            (narrow after ONE shuffle on the page key; the window and the
            aggregation share that partitioning, so Catalyst plans a
            single Exchange for both)
  rates     per-page (n_obs, n_changes, first_ts, last_ts) aggregation
  now       corpus max ts via a 1-row broadcast cross join
  score     n_changes · (now − last) / (last − first) — staleness in
            expected-changes units; each operand casts to double BEFORE
            the arithmetic, so every step is a single correctly-rounded
            IEEE op (no int64 product to overflow) and any ANSI engine
            ranks identically; pages with <2 observations have no rate
            estimate and sort last (score null), ties break on key

At 10^10 pages the fetch history is the engine's fetched_log; everything
shuffles (key, int64) tuples only — content signals are compared via the
lag window, never joined pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate_priorities(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    signal_col: str,
    top_k: int,
) -> DataFrame:
    """Top-``top_k`` pages by expected staleness from fetch history.

    ``obs``: one row per (page, fetch) with a content ``signal_col``
    (hash, etag, length — any equality-comparable change detector).
    Returns (key, n_obs, n_changes, rk). ``top_k`` is required: the head
    plans as TakeOrderedAndProject (per-partition top-k, no global
    sort), and the rank window runs over only the k winners — a FULL
    global staleness ranking would need a single-task window, and a
    recrawl campaign only ever consumes the head anyway. Observation
    order within a page is (ts, signal) so duplicate timestamps stay
    deterministic."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(
        F.asc(ts_col), F.asc(signal_col)
    )
    marked = obs.select(
        F.col(key_col),
        us.alias("_us"),
        (
            F.lag(signal_col).over(w).isNotNull()
            & (F.col(signal_col) != F.lag(signal_col).over(w))
        ).cast("long").alias("_chg"),
    )
    rates = marked.groupBy(key_col).agg(
        F.count("*").alias("n_obs"),
        F.sum("_chg").alias("n_changes"),
        F.min("_us").alias("_first"),
        F.max("_us").alias("_last"),
    )
    now = marked.agg(F.max("_us").alias("_now"))
    scored = rates.crossJoin(F.broadcast(now)).withColumn(
        "_score",
        F.when(
            F.col("_last") > F.col("_first"),
            # cast each operand to double BEFORE the multiply: the bigint
            # product n_changes·elapsed_µs can exceed int64 at decade-
            # scale staleness (Spark would wrap silently, an ANSI engine
            # would error); three correctly-rounded IEEE ops stay
            # engine-identical at any magnitude
            F.col("n_changes").cast("double")
            * (F.col("_now") - F.col("_last")).cast("double")
            / (F.col("_last") - F.col("_first")).cast("double"),
        ),
    )
    # head first (TakeOrderedAndProject — reduces to k rows with no
    # global sort), THEN the rank window over only those k rows
    head = scored.orderBy(
        F.desc_nulls_last("_score"), F.asc(key_col)
    ).limit(top_k)
    wr = Window.orderBy(F.desc_nulls_last("_score"), F.asc(key_col))
    return head.withColumn("rk", F.row_number().over(wr)).select(
        key_col, "n_obs", "n_changes", "rk"
    )
