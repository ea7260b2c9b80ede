"""Crawler-trap detection — URL-template mining over the frontier.

A crawler scoped to three publishers never meets a trap (the reference's
whole allow-list is ``crawling/crawling/settings.py`` + per-spider
``allowed_domains``), but a frontier at 10^10 URLs is MOSTLY traps unless
something prunes them: calendar pages that paginate to year 9999,
session-id path segments that mint a fresh "page" per visit, faceted
search that crosses every filter with every sort order. The classic
defenses are public: IRLbot's per-domain budget enforcement against
infinite link farms (Lee et al., "IRLbot: Scaling to 6 Billion Pages and
Beyond", WWW 2008 §5), Heritrix's pathological-URI / path-repetition
rules, and Google's crawl guidance on infinite URL spaces ("To infinity
and beyond? No!", Google Webmaster Central blog, 2008).

This operator mines the traps from the frontier itself instead of
hand-listing them:

  1. TEMPLATE each URL — mask the variable axes of the path+query
     (digit runs → ``{N}``, long hex runs → ``{H}``, query values →
     ``=*``). Pure JVM ``regexp_replace`` chain: narrow, zero Python,
     fully codegen'd.
  2. COUNT per (host, template) with map-side partial aggregation — the
     shuffle carries (host, template, count) partials, bounded by
     distinct-template cardinality (≪ #URLs; a trap is by definition a
     template with huge multiplicity, which is exactly what partial agg
     collapses before the wire).
  3. VERDICT per template in exact integer arithmetic: a (host,
     template) is a trap iff it has a TRAP-ELIGIBLE axis shape AND at
     least ``min_urls`` URLs AND at least ``min_host_pct`` percent of
     its host's frontier (``n_urls * 100 >= host_n * min_host_pct`` —
     no float ratios, so the DuckDB oracle twin agrees bit-for-bit).

     Eligible = contains ``{H}`` (session/hash mint), contains ``=*``
     (query/facet/calendar axis), or ADJACENT numeric path segments
     ``/{N}/{N}`` (date paths — the multiplicative-axis signature).
     Numeric axes separated by literal text are NOT eligible:
     ``/article/{N}``, ``/article/{N}/fig{N}.png``,
     ``/article/{N}/review_report`` are the shapes of every legitimate
     article/figure/review template, and on an article-heavy publisher
     they lawfully dominate their host — counting them as traps would
     prune the publisher's main content (pinned by the golden
     trap-gate-on parity test over the reference site, which must be a
     bit-exact no-op). The classic trap taxonomy (calendars, sessions,
     faceted search — the sources above) is entirely inside the
     eligible shapes; unbounded literal-separated pagination, the one
     trap family this exempts, is already bounded by the engine's
     per-host budgets (IRLbot's own defense for exactly that case).
  4. FILTER the frontier by broadcasting the trap dim (#trap-templates
     rows — tiny) into a LeftAnti broadcast hash join: the frontier
     itself never shuffles.

At 100 TB the only wide operation is step 2's bounded partial-agg
shuffle; host totals are an aggregate OF that dim, not of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: a (host, template) needs at least this many URLs to be a trap
MIN_URLS = 50
#: ...and at least this percent of its host's frontier
MIN_HOST_PCT = 25


def url_template(url: Column) -> Column:
    """Mask a URL's variable axes → its path+query template.

    Masking order matters and is mirrored exactly by the SQL twin:
    authority strip, then query VALUES (so hex/digit masking below only
    ever sees path segments and query keys), then hex runs of >= 8 chars
    (session ids, content hashes) → ``{H}``, then digit runs → ``{N}``.
    Collisions with literal path text (a real path ending in ``{N}``)
    merge templates — harmless for trap detection, which only widens the
    group being counted."""
    t = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    t = F.regexp_replace(t, r"=[^&#]*", "=*")
    t = F.regexp_replace(t, r"[0-9a-fA-F]{8,}", "{H}")
    return F.regexp_replace(t, r"[0-9]+", "{N}")


def _trap_eligible(template: Column) -> Column:
    """Axis shapes that can mint unbounded URL spaces (module doc §3):
    {H}, query values, or adjacent numeric path segments — numeric axes
    separated by literal text (article/figure/review templates) are
    exempt."""
    return (
        template.contains("{H}")
        | template.contains("=*")
        | template.contains("/{N}/{N}")
    )


def template_counts(
    frontier: DataFrame,
    url_col: str = "canonical_url",
    host_col: str = "host",
) -> DataFrame:
    """(host, template, n_urls) — the templated frontier collapsed to its
    count dim with map-side partial aggregation (trap multiplicity
    collapses before the wire)."""
    tmpl = frontier.select(
        F.col(host_col).alias("host"),
        url_template(F.col(url_col)).alias("template"),
    )
    return tmpl.groupBy("host", "template").agg(
        F.count("*").alias("n_urls")
    )


def trap_verdicts(
    counts: DataFrame,
    min_urls: int = MIN_URLS,
    min_host_pct: int = MIN_HOST_PCT,
) -> DataFrame:
    """Gate a (host, template, n_urls) count dim → adds (host_n, is_trap).

    ``host_n`` is a window sum over the dim — never a second pass over
    the frontier (a groupBy + join-back would re-execute the corpus-scan
    subtree; Spark does not CSE across self-join branches). Accepts any
    count source: one wave's batch, or a cumulative log union — which is
    how the engine's cross-wave gate catches slow-burn traps."""
    host_w = Window.partitionBy("host")
    return counts.withColumn(
        "host_n", F.sum("n_urls").over(host_w)
    ).select(
        "host",
        "template",
        "n_urls",
        "host_n",
        (
            _trap_eligible(F.col("template"))
            & (F.col("n_urls") >= min_urls)
            & (F.col("n_urls") * 100 >= F.col("host_n") * min_host_pct)
        )
        .cast("int")
        .alias("is_trap"),
    )


def trap_stats(
    frontier: DataFrame,
    url_col: str = "canonical_url",
    host_col: str = "host",
    min_urls: int = MIN_URLS,
    min_host_pct: int = MIN_HOST_PCT,
) -> DataFrame:
    """(host, template, n_urls, host_n, is_trap) — one row per (host,
    template) seen in the frontier: ``template_counts`` composed with
    ``trap_verdicts``."""
    return trap_verdicts(
        template_counts(frontier, url_col, host_col), min_urls, min_host_pct
    )


def trap_filter(
    frontier: DataFrame,
    url_col: str = "canonical_url",
    host_col: str = "host",
    min_urls: int = MIN_URLS,
    min_host_pct: int = MIN_HOST_PCT,
) -> DataFrame:
    """Frontier rows whose (host, template) is NOT a mined trap.

    The trap dim is broadcast into a LeftAnti hash join — the frontier
    never shuffles and keeps its schema (the template column is derived
    on the probe side and dropped)."""
    traps = (
        trap_stats(frontier, url_col, host_col, min_urls, min_host_pct)
        .filter(F.col("is_trap") == 1)
        .select("host", "template")
    )
    probed = frontier.withColumn(
        "_tmpl", url_template(F.col(url_col))
    )
    return probed.join(
        F.broadcast(traps),
        (probed[host_col] == traps["host"])
        & (probed["_tmpl"] == traps["template"]),
        "left_anti",
    ).drop("_tmpl")
