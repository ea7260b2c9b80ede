"""Deterministic synthetic web graph — the sandbox stand-in for live HTTP.

Models the reference's three-journal discovery tree (SURVEY.md §2.9 C1-C2):

- paginated search results (``learn_search_pages`` on page 0:
  /root/reference/crawling/crawling/spiders/mdpi_spider.py:40-47),
- article pages, a deterministic subset of which have reviews
  (mdpi_spider.py:91-101),
- review-report pages linking image payloads (the input_hint payload),
- a skewed-majority host (www.mdpi.com — the single-domain skew of
  mdpi_spider.py:16 that motivates salted repartition, SURVEY.md §2.9 C5),
- robots-disallowed ``/private/`` links, 403 pages for the retry path
  (utils.py:47-48), and cross-page duplicate links for the dedup path.

Everything is a pure function of the parameters — the Spark engine
materializes this as the ``site_graph`` table while the pure-Python
reference simulator walks the same dict, so crawl-order and URL-seen
equality is a meaningful golden test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# (host, host_seq, n_search_pages) — MDPI is the skewed-majority host.
DEFAULT_HOSTS: tuple[tuple[str, int, int], ...] = (
    ("www.mdpi.com", 0, 12),
    ("journals.plos.org", 1, 4),
    ("elifesciences.org", 2, 4),
)

PAGE_COUNT = 10  # articles per search page (mdpi_spider.py:30: page_count=10)

# Search pages outrank articles so breadth (page discovery) precedes depth,
# matching Scrapy FIFO-BFS at equal priority; within search pages, ascending
# page_no (article_spider.py:66-68). Articles rank by recency (north_star:
# sitemap depth + article-recency score).
PRI_SEARCH_BASE = 10_000
PRI_IMAGE = 10


@dataclass
class Page:
    url: str
    host: str
    kind: str  # search | article | review_report | image | private
    page_no: int | None = None
    total_pages: int | None = None
    out_links: list[tuple[str, int, int]] = field(default_factory=list)
    # (url, link_idx, priority) in document order
    status: int = 200
    pub_year: int | None = None
    has_reviews: bool | None = None


def search_url(host: str, page_no: int) -> str:
    return f"https://{host}/search?page_no={page_no}"


def article_url(host: str, num: int) -> str:
    return f"https://{host}/article/{num}"


def review_url(host: str, num: int) -> str:
    return f"https://{host}/article/{num}/review_report"


def image_url(host: str, num: int, fig: int) -> str:
    return f"https://{host}/article/{num}/fig{fig}.png"


def article_pub_year(host_seq: int, num: int) -> int:
    return 2015 + (num * 7 + host_seq) % 10


def article_has_reviews(num: int) -> bool:
    return num % 3 == 0


def article_status(num: int) -> int:
    # sparse 403s exercise the retry/error path (utils.py:47-48 raises on 403)
    return 403 if num % 53 == 17 else 200


def article_priority(host_seq: int, num: int) -> int:
    return article_pub_year(host_seq, num) - 1900


def build_site(hosts: tuple[tuple[str, int, int], ...] = DEFAULT_HOSTS) -> dict[str, Page]:
    """Build the full synthetic web as {url: Page} (canonical URLs)."""
    site: dict[str, Page] = {}
    for host, hseq, n_pages in hosts:
        for p in range(n_pages):
            links: list[tuple[str, int, int]] = []
            idx = 0
            if p == 0:
                # page 0 discovers the page range (A6 learn_search_pages)
                for q in range(1, n_pages):
                    links.append((search_url(host, q), idx, PRI_SEARCH_BASE - q))
                    idx += 1
            # PAGE_COUNT articles + 1 overlap with the next page (dedup path)
            lo = p * PAGE_COUNT
            hi = lo + PAGE_COUNT + (1 if p + 1 < n_pages else 0)
            for num in range(lo, hi):
                links.append(
                    (article_url(host, num), idx, article_priority(hseq, num))
                )
                idx += 1
            # robots-disallowed link — must never be fetched nor enter url_seen
            links.append((f"https://{host}/private/{p}", idx, 1))
            idx += 1
            site[search_url(host, p)] = Page(
                url=search_url(host, p),
                host=host,
                kind="search",
                page_no=p,
                total_pages=n_pages if p == 0 else None,
                out_links=links,
                status=200,
            )
        n_articles = n_pages * PAGE_COUNT
        for num in range(n_articles):
            a_links: list[tuple[str, int, int]] = []
            if article_has_reviews(num):
                a_links.append(
                    (review_url(host, num), 0, article_priority(hseq, num))
                )
            site[article_url(host, num)] = Page(
                url=article_url(host, num),
                host=host,
                kind="article",
                out_links=a_links,
                status=article_status(num),
                pub_year=article_pub_year(hseq, num),
                has_reviews=article_has_reviews(num),
            )
            if article_has_reviews(num):
                r_links = [
                    (image_url(host, num, fig), fig - 1, PRI_IMAGE)
                    for fig in (1, 2)
                ]
                site[review_url(host, num)] = Page(
                    url=review_url(host, num),
                    host=host,
                    kind="review_report",
                    out_links=r_links,
                    status=200,
                    pub_year=article_pub_year(hseq, num),
                )
                for fig in (1, 2):
                    site[image_url(host, num, fig)] = Page(
                        url=image_url(host, num, fig),
                        host=host,
                        kind="image",
                        status=200,
                    )
    return site


def seeds(hosts: tuple[tuple[str, int, int], ...] = DEFAULT_HOSTS) -> list[tuple[str, int, int]]:
    """Seed list: (url, host_seq_as_seq, priority) — search page 0 per host."""
    return [(search_url(h, 0), hseq, PRI_SEARCH_BASE) for h, hseq, _ in hosts]


#: robots.txt rules per host: (disallow prefixes, crawl_delay_budget | None).
#: The reference sets ROBOTSTXT_OBEY=False (settings.py:20) but the north
#: rule makes robots a first-class toggle; /private is disallowed everywhere,
#: and elifesciences.org carries a crawl-delay that halves its budget.
ROBOTS_RULES: dict[str, tuple[tuple[str, ...], int | None]] = {
    "www.mdpi.com": (("/private",), None),
    "journals.plos.org": (("/private",), None),
    "elifesciences.org": (("/private",), 4),
}
