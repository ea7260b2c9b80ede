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

# RE2 (pyarrow.compute) cannot express the lookahead above, so the arrow
# tier unrolls it: the main shape without the segment guard, plus literal
# checks that reject exactly the "." / ".." segments the guard rejected
# (a "/./" or "/../" infix, or a "/." / "/.." suffix — the host part
# cannot contain "/", so every occurrence is a path segment).
_FAST_MAIN_RE2 = (
    r"^https://[a-z0-9][a-z0-9.-]*(?:/[!$&'()*+,;=~A-Za-z0-9:@._-]*)+$"
)
_TIER2_SPLIT_RE2 = r"^(?P<sh>[A-Za-z][A-Za-z0-9+.-]*://[^/]*)(?P<tail>.*)$"

# Lean-query tier: canonical base + "?" + query of raw-safe chars (no "%",
# "#", "?", no port/userinfo in the host). For such URLs the ONLY work
# canonicalize_one would do is sort the (k, v) chunks — _requote is an
# identity without "%", the scheme/host are already lowercase, and the
# dot-segment rejection is applied to the base separately.
_LEAN_QUERY_RE2 = (
    r"^https://[a-z0-9][a-z0-9.-]*(?:/[!$&'()*+,;=~A-Za-z0-9:@._-]*)+"
    r"\?[!$&'()*+,;=~A-Za-z0-9:@._-]+$"
)


def _canon_query_lean(s: str) -> str:
    """canonicalize_one's query branch for a gate-approved lean URL: sort
    chunks by (key, value), drop empties, re-join — byte-identical to the
    urlsplit path because every other step is an identity on this shape."""
    base, _, q = s.partition("?")
    pairs = []
    for chunk in q.split("&"):
        if not chunk:
            continue
        k, _, v = chunk.partition("=")
        pairs.append((k, v))
    if not pairs:
        return base
    pairs.sort()
    return base + "?" + "&".join(f"{k}={v}" for k, v in pairs)


def _fast_mask(arr):
    """False-filled boolean mask of already-canonical URLs (RE2 tier)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    m = pc.match_substring_regex(arr, _FAST_MAIN_RE2)
    bad = pc.or_(
        pc.or_(
            pc.match_substring(arr, "/./"), pc.match_substring(arr, "/../")
        ),
        pc.or_(
            pc.ends_with(arr, pattern="/."), pc.ends_with(arr, pattern="/..")
        ),
    )
    return pc.fill_null(pc.and_(m, pc.invert(bad)), False)


def _canonicalize_batch(urls):
    """U2 batch canonicalize over a pyarrow Array (pd.Series accepted for
    the unit-test seam) — three tiers, the first two fully in Arrow C++:

    1. two cheap vectorized repairs — ``#review_report`` →
       ``/review_report`` (the reference's 404 repair, before generic
       fragment handling), fragment strip, scheme+host lowercase — are
       identities on already-canonical URLs, so one pass serves both the
       old fast and repair tiers;
    2. repaired URLs that pass the canonical-shape gate are fixed points
       of canonicalize_one (fuzz-pinned) and are returned as-is;
    3. only the remainder (queries, ports, %-escapes, dot-segments,
       missing scheme) pays the per-URL urllib cost, on the ORIGINAL
       string.

    The RE2 gate anchors ``$`` at end-of-text (Python's ``$`` also matched
    before a trailing newline), so whitespace-damaged URLs now always take
    the slow path — strictly closer to canonicalize_one.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pd.Series):
        urls = pa.Array.from_pandas(urls, type=pa.string())
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    arr = urls.cast(pa.string())
    rep = pc.replace_substring(
        arr, pattern="#review_report", replacement="/review_report"
    )
    rep = pc.replace_substring_regex(rep, pattern="#.*$", replacement="")
    ex = pc.extract_regex(rep, pattern=_TIER2_SPLIT_RE2)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(ex, "sh")),
        pc.struct_field(ex, "tail"),
        "",
    )
    rep = pc.if_else(pc.is_valid(ex), lowered, rep)
    good = _fast_mask(rep)
    not_good = pc.invert(good)
    # lean-query tier: the base (everything before "?") must itself pass
    # the canonical gate, incl. the dot-segment rejection
    base = pc.list_element(pc.split_pattern(rep, "?", max_splits=1), 0)
    lean = pc.and_(
        pc.and_(
            pc.fill_null(pc.match_substring_regex(rep, _LEAN_QUERY_RE2), False),
            _fast_mask(base),
        ),
        not_good,
    )
    lean_np = lean.to_numpy(zero_copy_only=False)
    lean_idx = np.nonzero(lean_np)[0]
    if len(lean_idx):
        lean_vals = pc.take(rep, pa.array(lean_idx)).to_pylist()
        fixed_np = np.full(len(arr), None, dtype=object)
        fixed_np[lean_idx] = [_canon_query_lean(s) for s in lean_vals]
        rep = pc.if_else(lean, pa.array(fixed_np, type=pa.string()), rep)
        good = pc.or_(good, lean)
    idx = np.nonzero(pc.invert(good).to_numpy(zero_copy_only=False))[0]
    if not len(idx):
        return rep
    orig = pc.take(arr, pa.array(idx)).to_pylist()
    slow_np = np.full(len(arr), None, dtype=object)
    slow_np[idx] = [
        canonicalize_one(u) if u is not None else None for u in orig
    ]
    return pc.if_else(good, rep, pa.array(slow_np, type=pa.string()))


try:  # Spark 4.1+: vectorized Arrow-native UDF — no pandas object round trip
    from pyspark.sql.functions import arrow_udf as _arrow_udf

    canonicalize_udf = _arrow_udf(_canonicalize_batch, T.StringType())
except ImportError:  # pragma: no cover — older runtimes fall back to pandas
    canonicalize_udf = F.pandas_udf(_canonicalize_batch, T.StringType())


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
