"""PII detection and redaction over text columns — JVM-side regex only.

A training-data pipeline scrubs personally identifying strings before any
corpus leaves the ingest tier. Everything here is `regexp_extract_all` /
`regexp_replace` on built-in columns (whole-stage codegen, zero Python),
so the scrub adds no shuffle and no UDF to the scan.

The patterns deliberately use the regex subset with identical semantics
in Java (Spark), RE2 (DuckDB oracle twin), and Python `re` (unit tests):
character classes, bounded repetition, `\\b`, `\\d` — no lookaround, no
backreferences. Redaction order matters (an email contains dot-separated
digit runs an IPv4 pattern could bite): emails first, then IPv4, then
phone numbers; `REDACT_ORDER` is the single source of that ordering for
both the Spark path and the SQL twin.

Reference behavior analog: the reference crawler stores raw contact
emails scraped from JATS (`/root/reference/rarticle.py` corresponding-
author extraction); this operator is the inverse gate a 100 TB corpus
needs before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token); ORDER IS THE REDACTION ORDER
REDACT_ORDER: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts, computed on the ORIGINAL text (counts must
    not depend on redaction order, so each pattern scans the raw input)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat))
        for name, pat, _ in REDACT_ORDER
    }


def redact(text: Column) -> Column:
    """Sequential redaction in REDACT_ORDER."""
    out = text
    for _, pat, token in REDACT_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_email / n_ipv4 / n_phone counters and a `redacted` column.

    Pure narrow projection: the plan is scan -> project, predicates around
    it still push down to the parquet scan."""
    text = F.col(text_col)
    cols = [df[c] for c in df.columns]
    counts = pii_counts(text)
    return df.select(
        *cols,
        *[v.alias(k) for k, v in counts.items()],
        redact(text).alias("redacted"),
    )
