"""URL identity: RFC-3986 canonicalization, host extraction, xxhash64.

Replaces the reference's implicit URL algebra — ad-hoc repairs like
``#review_report`` → ``/review_report`` and missing-scheme fixes
(/root/reference/crawling/crawling/spiders/mdpi_review_spider.py:85-97,140-142)
and Scrapy's request-fingerprint canonicalization — with one explicit,
deterministic canonical form shared by the engine and the reference
simulator.

Canonicalization runs as an Arrow-batched pandas UDF (U2, SURVEY.md §2.10):
the per-URL logic is pure Python over a batch, shipped via Arrow — never a
row-at-a-time Python UDF in the plan. Hashing and host extraction stay
JVM-side (``xxhash64``, ``regexp_extract``) so Catalyst can codegen them.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# RFC 3986 §2.3 unreserved characters: the ONLY octets whose %-escapes are
# decoded during normalization. Reserved/other escapes keep their bytes
# (uppercased hex) — decoding them would conflate distinct URLs (e.g.
# '?a=%26b' vs '?a=&b' are different resources) and break idempotence.
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RX = re.compile(r"%([0-9A-Fa-f]{2})")


def _requote(s: str) -> str:
    """RFC 3986 percent-encoding normalization: decode unreserved escapes,
    uppercase the hex of everything else; idempotent by construction."""

    def fix(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RX.sub(fix, s)


def canonicalize_one(url: str) -> str:
    """Canonicalize a single URL (pure function; shared with the simulator).

    Rules (superset of Scrapy's w3lib ``canonicalize_url`` behavior):
    - missing scheme → https (reference repair: mdpi_review_spider.py:140-142)
    - ``#review_report`` fragment → ``/review_report`` path segment
      (reference 404-repair: mdpi_review_spider.py:86-91)
    - scheme + host lowercased; default port stripped
    - dot-segments resolved; empty path → "/"
    - query params sorted by raw (key, value) chunks; fragment dropped
    - percent-encoding normalized per RFC 3986: only unreserved escapes
      decode; reserved escapes keep their bytes (hex uppercased), so
      '?a=%26b' and '?a=&b' stay distinct and the function is idempotent
    """
    if not url:
        return url
    url = url.strip()
    if "#review_report" in url:
        url = url.replace("#review_report", "/review_report")
    if "://" not in url:
        url = "https://" + url.lstrip("/")
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    try:
        port = parts.port
    except ValueError:  # non-numeric port garbage — keep it verbatim
        netloc = parts.netloc.lower()
    else:
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
    path = _requote(parts.path)
    # resolve dot-segments
    if "." in path:
        out: list[str] = []
        for seg in path.split("/"):
            if seg == ".":
                continue
            if seg == "..":
                if out and out[-1]:
                    out.pop()
                continue
            out.append(seg)
        path = "/".join(out) or "/"
    if not path:
        path = "/"
    query = ""
    if parts.query:
        pairs = []
        for chunk in parts.query.split("&"):
            if not chunk:
                continue
            k, _, v = chunk.partition("=")
            pairs.append((_requote(k), _requote(v)))
        pairs.sort()
        query = "&".join(f"{k}={v}" for k, v in pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


# Already-canonical URLs skip the slow path entirely: https scheme,
# lowercase host, a path of segments none of which is "." / ".." and none
# containing %-escapes, query, fragment, or port. Fuzz-tested against
# canonicalize_one: every URL this accepts must be a fixed point.
_FAST_CANONICAL = (
    r"^https://[a-z0-9][a-z0-9.-]*"
    r"(?:/(?!\.\.?(?:/|$))[!$&'()*+,;=~A-Za-z0-9:@._-]*)+$"
)


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """U2 batch canonicalize — Arrow batch in, Arrow batch out.

    Three tiers, each vectorized over the whole batch:
    1. already-canonical URLs (regex gate) pass through untouched;
    2. URLs that become canonical after two cheap vectorized repairs —
       ``#review_report`` → ``/review_report`` (the reference's 404 repair,
       before generic fragment handling), fragment strip, scheme+host
       lowercase — are re-gated by the same regex; passing the gate proves
       the repaired form is a fixed point, and canonicalize_one is invariant
       under exactly these repairs, so the result is identical;
    3. only the remainder (queries, ports, %-escapes, dot-segments, missing
       scheme) pays the per-URL urllib cost.
    """
    fast = urls.str.match(_FAST_CANONICAL, na=False)
    out = urls.copy()
    rest = ~fast
    if rest.any():
        repaired = (
            urls[rest]
            .str.replace("#review_report", "/review_report", regex=False)
            .str.replace(r"#.*$", "", regex=True)
        )
        parts = repaired.str.extract(
            r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)(.*)$", expand=True
        )
        lowered = parts[0].str.lower() + parts[1].fillna("")
        repaired = lowered.where(parts[0].notna(), repaired)
        mid = repaired.str.match(_FAST_CANONICAL, na=False)
        out[repaired[mid].index] = repaired[mid]
        slow = repaired[~mid].index
        if len(slow):
            out[slow] = urls[slow].map(
                lambda u: canonicalize_one(u) if u is not None else None
            )
    return out


def host_of(canonical: Column) -> Column:
    """Host component of an already-canonical URL — pure JVM regexp."""
    return F.regexp_extract(canonical, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def url_hash_of(canonical: Column) -> Column:
    """64-bit identity used by the frontier / url_seen / bloom layers.

    Spark's built-in xxhash64 (JVM-side, codegen'd) replaces Scrapy's SHA1
    request fingerprints — at 10^10 scale the 8-byte hash is the join key and
    the bloom key; the canonical string is kept only for exact confirm.
    """
    return F.xxhash64(canonical)


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add canonical_url / host / url_hash columns to any URL-bearing frame."""
    return (
        df.withColumn("canonical_url", canonicalize_udf(F.col(url_col)))
        .withColumn("host", host_of(F.col("canonical_url")))
        .withColumn("url_hash", url_hash_of(F.col("canonical_url")))
    )
