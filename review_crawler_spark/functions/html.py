"""S9: vectorized HTML cleaning before sink.

The reference strips <script>, <style>, <noscript>, <link>, <rect> and HTML
comments from every fetched page before dumping it to disk
(/root/reference/crawling/crawling/spiders/article_spider.py:168-180,
BeautifulSoup extract() calls + ``str(soup).replace('\\n\\n','\\n')``).
Here the same cleanup is a chain of JVM regexp_replace expressions — one
codegen'd pass per pattern, no Python in the path, applicable to a binary/
string column of billions of pages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# elements whose CONTENT is also dropped (extract() removes the subtree)
_CONTAINER_TAGS = ("script", "style", "noscript", "rect")


def clean_html(html: Column) -> Column:
    """Strip script/style/noscript/rect subtrees, <link> void elements and
    comments; collapse double newlines (single pass, like str.replace)."""
    out = html
    for tag in _CONTAINER_TAGS:
        out = F.regexp_replace(
            out, f"(?is)<{tag}\\b[^>]*/>|<{tag}\\b[^>]*>.*?</{tag}\\s*>", ""
        )
    out = F.regexp_replace(out, r"(?is)<link\b[^>]*>", "")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", "")
    out = F.regexp_replace(out, r"\n\n", "\n")
    return out


def rel_canonical(html: Column) -> Column:
    """The page-declared canonical URL (RFC 6596 ``<link
    rel="canonical">``), or NULL when the page declares none.

    Two codegen'd regexp_extract passes cover both attribute orders real
    pages emit (rel-first and href-first); intervening attributes
    (``type=...`` between rel and href), either quote style, and unquoted
    attribute values are all tolerated. Crawl-side use: canonical
    declarations form edges
    (page → canonical) that chain exactly like 3xx redirects — feed them
    to operators/redirects.py::resolve_redirects to consolidate
    duplicate URLs to their canonical terminals before frontier
    admission (Google's canonicalization contract; the reference never
    needs this because its three publishers serve one URL per article)."""
    rel_first = F.regexp_extract(
        html,
        r'(?i)<link\b[^>]*\brel\s*=\s*["\']?canonical["\']?[^>]*'
        r'\bhref\s*=\s*(?:"([^"]*)"|\'([^\']*)\'|([^\s"\'>]+))',
        0,
    )
    href_first = F.regexp_extract(
        html,
        r'(?i)<link\b[^>]*\bhref\s*=\s*(?:"([^"]*)"|\'([^\']*)\''
        r'|([^\s"\'>]+))[^>]*\brel\s*=\s*["\']?canonical["\']?',
        0,
    )

    def _href(m: Column) -> Column:
        # the href value whichever quote-style alternative matched
        quoted = F.regexp_extract(m, r'(?i)href\s*=\s*"([^"]*)"', 1)
        single = F.regexp_extract(m, r"(?i)href\s*=\s*'([^']*)'", 1)
        bare = F.regexp_extract(m, r'''(?i)href\s*=\s*([^\s"'>]+)''', 1)
        return (
            F.when(quoted != "", quoted)
            .when(single != "", single)
            .when(bare != "", bare)
        )

    return (
        F.when(rel_first != "", _href(rel_first))
        .when(href_first != "", _href(href_first))
    )


BANNED_TAGS_PATTERN = (
    r"(?is)<(script|style|noscript|rect|link)\b|<!--"
)


def banned_tag_count(html: Column) -> Column:
    """Number of surviving banned constructs — 0 after clean_html (the
    round-trip assertion the oracle checks)."""
    return F.regexp_count(html, F.lit(BANNED_TAGS_PATTERN))
