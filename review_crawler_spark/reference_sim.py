"""Pure-Python reference crawler simulator — the golden oracle.

Re-implements, in plain sequential Python (no Spark), the observable
scheduling semantics of the reference crawler (SURVEY.md §2.9):

- BFS waves (Scrapy FIFO at equal priority),
- per-host politeness budget per wave (CONCURRENT_REQUESTS_PER_DOMAIN=8,
  /root/reference/crawling/crawling/settings.py:28-30; robots crawl-delay
  halves elife's budget),
- priority order within a host: (priority DESC, seq ASC), seq being the
  deterministic document-order link index (follow_all preserves selector
  order, mdpi_spider.py:36-38),
- URL-seen dedup at discovery (Scrapy RFPDupeFilter, default-on),
- robots disallow filtering at discovery,
- 403/404 retry-once-then-fail (utils.py:47-48; mdpi_review_spider.py:86-91),
- stop when the frontier drains.

The global crawl-order contract is ``ORDER BY wave, priority DESC, host,
seq``. The Spark engine must reproduce ``fetch_order`` and ``url_seen``
exactly under the same seed list + politeness budget.
"""

from __future__ import annotations

from dataclasses import dataclass

from .functions.urls import canonicalize_one
from .sources.sitegen import DEFAULT_HOSTS, ROBOTS_RULES, Page, build_site, seeds

DEFAULT_BUDGET = 8
MAX_ATTEMPTS = 2
SEQ_STRIDE = 1000  # child seq = parent_seq * SEQ_STRIDE + link_idx


@dataclass
class SimResult:
    fetch_order: list[str]  # canonical URLs in crawl order
    fetch_rows: list[tuple[int, str, str, int, int]]  # (wave, url, host, pri, seq)
    url_seen: set[str]
    metrics: list[dict]
    waves: int


def robots_allows(host: str, url: str, rules=None) -> bool:
    rules = ROBOTS_RULES if rules is None else rules
    prefixes, _ = rules.get(host, ((), None))
    path = url.split(host, 1)[-1]
    return not any(path.startswith(p) for p in prefixes)


def host_budget(host: str, default: int = DEFAULT_BUDGET, rules=None) -> int:
    rules = ROBOTS_RULES if rules is None else rules
    _, delay_budget = rules.get(host, ((), None))
    return delay_budget if delay_budget is not None else default


def simulate(
    site: dict[str, Page] | None = None,
    hosts=DEFAULT_HOSTS,
    budget: int = DEFAULT_BUDGET,
    max_waves: int = 1000,
    rules: dict | None = None,
    seq_stride: int = SEQ_STRIDE,
) -> SimResult:
    site = site if site is not None else build_site(hosts)
    rules = ROBOTS_RULES if rules is None else rules
    frontier: list[dict] = []
    url_seen: set[str] = set()
    fetch_rows: list[tuple[int, str, str, int, int]] = []
    metrics: list[dict] = []

    for url, hseq, pri in seeds(hosts):
        cu = canonicalize_one(url)
        url_seen.add(cu)
        frontier.append(
            dict(url=cu, host=cu.split("/")[2], priority=pri, depth=0,
                 seq=hseq, state="queued", attempt=0)
        )

    wave = 0
    while wave < max_waves:
        queued = [e for e in frontier if e["state"] == "queued"]
        if not queued:
            break
        scheduled: list[dict] = []
        by_host: dict[str, list[dict]] = {}
        for e in queued:
            by_host.setdefault(e["host"], []).append(e)
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e["priority"], e["seq"]))
            scheduled.extend(entries[: host_budget(host, budget, rules)])

        fetched: list[tuple[dict, Page]] = []
        errors = 0
        for e in scheduled:
            page = site.get(e["url"])
            status = page.status if page is not None else 404
            if status == 200:
                e["state"] = "fetched"
                fetched.append((e, page))
            else:
                errors += 1
                e["attempt"] += 1
                if e["attempt"] >= MAX_ATTEMPTS:
                    e["state"] = "failed"

        # global order contract within the wave
        fetched.sort(key=lambda ep: (-ep[0]["priority"], ep[0]["host"], ep[0]["seq"]))
        for e, _ in fetched:
            fetch_rows.append((wave, e["url"], e["host"], e["priority"], e["seq"]))

        # discovery: document-order links, canonicalize, robots, dedup
        new_count = 0
        deduped = 0
        batch_best: dict[str, dict] = {}
        for e, page in fetched:
            for link_url, link_idx, pri in page.out_links:
                cu = canonicalize_one(link_url)
                host = cu.split("/")[2]
                if not robots_allows(host, cu, rules):
                    continue
                if cu in url_seen:
                    deduped += 1
                    continue
                cand = dict(
                    url=cu, host=host, priority=pri, depth=e["depth"] + 1,
                    seq=e["seq"] * seq_stride + link_idx, state="queued", attempt=0,
                )
                prev = batch_best.get(cu)
                if prev is None or (-cand["priority"], cand["seq"]) < (
                    -prev["priority"], prev["seq"]
                ):
                    if prev is not None:
                        deduped += 1
                    batch_best[cu] = cand
                else:
                    deduped += 1
        for cand in batch_best.values():
            url_seen.add(cand["url"])
            frontier.append(cand)
            new_count += 1

        per_host_fetched: dict[str, int] = {}
        for e, _ in fetched:
            per_host_fetched[e["host"]] = per_host_fetched.get(e["host"], 0) + 1
        for host, entries in by_host.items():
            metrics.append(
                dict(wave=wave, host=host,
                     urls_scheduled=min(len(entries), host_budget(host, budget, rules)),
                     urls_fetched=per_host_fetched.get(host, 0),
                     urls_deduped=deduped, errors=errors)
            )
        wave += 1

    return SimResult(
        fetch_order=[r[1] for r in fetch_rows],
        fetch_rows=fetch_rows,
        url_seen=url_seen,
        metrics=metrics,
        waves=wave,
    )
