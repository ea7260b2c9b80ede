"""DOI / filename / text scalar functions — all JVM-side built-ins.

Each helper re-expresses one scalar function from the reference
(SURVEY.md §2.8 X1-X12) as a Catalyst Column expression so it stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DOI regex used by the MDPI spider (/root/reference/crawling/crawling/
#: spiders/mdpi_spider.py:7-8).
DOI_PATTERN = r"https://doi\.org/10\.\d{4,9}/[-._;()/:a-zA-Z0-9]+"

#: Retraction banner (/root/reference/crawling/crawling/spiders/mdpi_spider.py:10).
RETRACTION_PATTERN = r"Retraction published on \d+"


def doi_to_short_doi(doi: Column) -> Column:
    """X1 — last path segment (/root/reference/plos_crawler.py:52-60)."""
    return F.substring_index(doi, "/", -1)


def url_to_doi(url: Column) -> Column:
    """X2 — DOI out of an ``?id=10.…`` query (/root/reference/plos_crawler.py:39-49)."""
    return F.regexp_extract(url, r"id=(10\..*)", 1)


def filename_to_short_doi(filename: Column) -> Column:
    """X3 — ``elife-47612-v2.xml`` → ``elife.47612``
    (/root/reference/elife_crawler.py:41-42: replace('-','.',1).split('-')[0])."""
    first = F.substring_index(filename, "-", 1)
    rest = F.substring_index(F.substring_index(filename, "-", 2), "-", -1)
    return F.concat(first, F.lit("."), rest)


def doi_to_url(doi: Column, base: str = "https://elifesciences.org/articles/") -> Column:
    """X4 — concat base + doi tail (/root/reference/elife_crawler.py:47-48)."""
    return F.concat(F.lit(base), F.substring_index(doi, ".", -1))


def extension_of(path: Column) -> Column:
    """X5 — os.path.splitext tail (/root/reference/utils.py:54-55)."""
    return F.regexp_extract(path, r"(\.[^.\\/]*)$", 1)


def extract_doi(text: Column) -> Column:
    """X6 — first DOI link in free text."""
    return F.regexp_extract(text, DOI_PATTERN, 0)


def is_retracted(html_text: Column) -> Column:
    """F9 — retraction predicate (/root/reference/crawling/.../mdpi_spider.py:69)."""
    return html_text.rlike(RETRACTION_PATTERN)


def scrub_whitespace(s: Column) -> Column:
    """X8 — hard-space scrub + whitespace collapse
    (/root/reference/rarticle.py:996-999,1206-1208)."""
    return F.trim(F.regexp_replace(F.regexp_replace(s, " ", " "), r"\s+", " "))


def sub_article_id(short_doi: Column, kind: Column, ordinal: Column) -> Column:
    """X9 — generated ids ``<short>.r{N}`` / ``.a{N}`` / ``.s{i}``
    (/root/reference/plos_crawler.py:84-90)."""
    return F.format_string("%s.%s%d", short_doi, kind, ordinal)


def join_emails(emails: Column) -> Column:
    """X10 — ``'; '.join(emails)`` (/root/reference/rarticle.py:1120-1126)."""
    return F.array_join(emails, "; ")


def split_keywords(kw: Column) -> Column:
    """X11 — keyword split on '; ' (/root/reference/crawling/.../mdpi_spider.py:71-75)."""
    return F.split(kw, "; ")
