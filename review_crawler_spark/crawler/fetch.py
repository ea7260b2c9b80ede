"""S3/S4: the production HTTP-fetch stage as a host-partitioned Arrow pass.

The reference fetches with a polite sleep ∈ [0.5, 4.5] s before every GET
and raises on 403 pages (/root/reference/utils.py:16-17,41-49 ``cook``);
Scrapy enforces per-domain concurrency for the spiders
(crawling/settings.py CONCURRENT_REQUESTS_PER_DOMAIN). This module is the
distributed twin: scheduled URLs repartition BY HOST so one task owns one
host's wave slice (politeness is then local — a per-task pacer, no
coordination), and the GET itself is an injected ``fetcher(url) ->
(status, bytes)`` callable:

- production: a ``requests.Session``-backed fetcher (built lazily inside
  the task; this sandbox has no network, so it stays a documented seam like
  functions/images.decode_real);
- tests/engine: a dict-backed fake — the seam is integration-tested with
  403/404/timeout behaviors in tests/test_fetch.py.

The wave ENGINE (scheduler.py) keeps its join-against-site_graph fetch —
bit-exact against the reference simulator; this module is what a real
deployment swaps in at the FETCH step, with identical output columns.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference politeness window (utils.py:16-17) — a *pacer floor per host*,
# not a random sleep: at politeness-bound rates the deterministic floor
# dominates and keeps the task's request spacing ≥ min_tbr
MIN_TBR = 0.5
MAX_TBR = 4.5

FETCHED_SCHEMA = (
    "url string, canonical_url string, url_hash bigint, host string, "
    "priority bigint, depth int, wave int, seq bigint, "
    "status int, body binary, fetch_error string, fetched_at double"
)


def requests_fetcher(timeout: float = 30.0) -> Callable[[str], tuple[int, bytes]]:
    """Production fetcher factory (requests.Session per task).

    Returns a closure; the Session is created on first call so the factory
    can be shipped to executors without a live connection. Raises
    ImportError where ``requests`` is unavailable (this sandbox) — inject a
    fake instead, the plumbing is identical.
    """
    state: dict = {}

    def fetch(url: str) -> tuple[int, bytes]:
        import requests  # deferred: not available in this sandbox

        sess = state.get("s")
        if sess is None:
            sess = state["s"] = requests.Session()
        resp = sess.get(url, timeout=timeout)
        body = resp.content
        # the reference treats in-page "403 Forbidden" text as a hard error
        # (utils.py:47-48) even when the transport status is 200
        if b"403 Forbidden" in body:
            return 403, body
        return resp.status_code, body

    return fetch


def fetch_pages(
    scheduled: DataFrame,
    fetcher: Callable[[str], tuple[int, bytes]],
    min_tbr: float = MIN_TBR,
    pace: bool = True,
) -> DataFrame:
    """Fetch a wave's scheduled URLs: one task per host partition.

    Politeness: rows repartition on ``host`` so a host's whole wave slice
    lands in one task (the per-host budget upstream already caps slice
    size); ``pace=True`` enforces ≥ ``min_tbr`` seconds between requests to
    the SAME host — a per-host stamp dict local to the task, no cluster
    coordination, exactly the per-domain pacing the reference gets from its
    in-loop sleep. Hash partitioning co-locates several hosts per task;
    those interleave round-robin so their pacing floors overlap instead of
    summing.
    Fetcher exceptions never kill the task: rows get ``fetch_error`` and
    status 0 (the engine's retry policy requeues them).
    """
    cols = [
        "url", "canonical_url", "url_hash", "host", "priority", "depth",
        "wave", "seq",
    ]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # pacer keyed BY HOST: repartition(host) hash-partitions, so several
        # hosts routinely share one task — a single scalar pacer would then
        # enforce min_tbr *across* hosts, serializing hosts that could
        # proceed in parallel (politeness held, throughput didn't). Per-host
        # stamps keep the ≥min_tbr floor per host while co-resident hosts
        # interleave without cross-host sleeps.
        last_request: dict[str, float] = {}
        for pdf in it:
            if pace and pdf["host"].nunique() > 1:
                # round-robin the batch across its hosts (1st row of each
                # host, then 2nd of each, …): a host's successive requests
                # are then separated by the other hosts' work, so the
                # per-host floor is usually already satisfied and sleeps
                # overlap instead of summing. Within-host order is
                # preserved (cumcount is stable); output order is
                # irrelevant to the unordered DataFrame contract.
                pdf = (
                    pdf.assign(_rr=pdf.groupby("host").cumcount())
                    .sort_values("_rr", kind="stable")
                    .drop(columns="_rr")
                )
            out = {c: pdf[c] for c in cols}
            statuses, bodies, errors, stamps = [], [], [], []
            for url, host in zip(pdf["url"], pdf["host"]):
                if pace:
                    wait = min_tbr - (
                        time.monotonic() - last_request.get(host, 0.0)
                    )
                    if wait > 0:
                        time.sleep(wait)
                last_request[host] = time.monotonic()
                try:
                    status, body = fetcher(url)
                    statuses.append(status)
                    bodies.append(body)
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 — isolate bad fetches
                    statuses.append(0)
                    bodies.append(None)
                    errors.append(str(exc)[:200])
                stamps.append(time.time())
            out["status"] = statuses
            out["body"] = bodies
            out["fetch_error"] = errors
            out["fetched_at"] = stamps
            yield pd.DataFrame(out)

    return (
        scheduled.select(*cols)
        .repartition(F.col("host"))
        .mapInPandas(run, schema=FETCHED_SCHEMA)
    )
