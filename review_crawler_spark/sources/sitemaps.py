"""Sitemap scan source — the discovery feed the priority queue scores on.

The north star prices frontier priority off *publisher sitemap depth +
article recency*; the reference reaches article URLs by walking paginated
search pages (crawling/crawling/spiders/mdpi_spider.py:36-38), but real
publishers expose the same inventory as sitemaps.org XML: a
``<sitemapindex>`` of child sitemaps, each a ``<urlset>`` of
``<url><loc/><lastmod/><priority/></url>`` entries (protocol caps one
urlset at 50k URLs / 50 MB, so a big publisher IS a directory of many
files — a natural Spark scan unit, one task per file, exactly like the
WARC segments).

- ``parse_sitemap_xml`` — one file → typed entries (stdlib ElementTree,
  namespace-tolerant; malformed XML raises ValueError per the codec
  hardening contract);
- ``scan_sitemaps`` — binaryFile scan over a sitemap directory +
  Arrow-batched parse → one row per entry, ``kind`` ∈ {sitemap, url}
  (index rows point at child sitemaps — with the corpus mirrored locally
  there is nothing to fetch, they are lineage);
- ``sitemap_seed_frontier`` — urlset rows → seed rows (canonical url,
  recency-scored priority, depth) ready for the engine's DataFrame
  ``seed`` path: priority = days-since-epoch of lastmod (recency) plus
  the sitemap's own 0.0-1.0 priority hint scaled to tenths, all integer
  math so re-runs are bit-stable.

Robots tie-in: ``sitemap_urls_from_robots`` lifts ``Sitemap:`` lines
(the robots.txt discovery hook, which the crawler's robots dimension
otherwise ignores) so a host's sitemap directory can be located from the
same fetch that produced its disallow rules.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from xml.sax.saxutils import escape as xml_escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SITEMAP_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("sitemap", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("loc", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("priority_hint", T.DoubleType(), True),
    ]
)


def _local(tag: str) -> str:
    """Element tag without its XML namespace."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_xml(text: str) -> list[dict]:
    """One sitemap document → entry dicts (kind, loc, lastmod,
    priority_hint). Accepts both ``<sitemapindex>`` and ``<urlset>``
    roots, any xmlns. Raises ValueError on malformed XML or an
    unexpected root element."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from None
    rt = _local(root.tag)
    if rt == "sitemapindex":
        kind, child_tag = "sitemap", "sitemap"
    elif rt == "urlset":
        kind, child_tag = "url", "url"
    else:
        raise ValueError(f"not a sitemap document (root <{rt}>)")
    out: list[dict] = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields = {_local(c.tag): (c.text or "").strip() for c in el}
        loc = fields.get("loc", "")
        if not loc:
            raise ValueError(f"<{child_tag}> entry without <loc>")
        pr = fields.get("priority")
        out.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": fields.get("lastmod") or None,
                "priority_hint": float(pr) if pr else None,
            }
        )
    return out


def sitemap_urls_from_robots(text: str) -> list[str]:
    """``Sitemap:`` lines from a robots.txt body (they live outside
    user-agent groups per the spec)."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, val = line.partition(":")
        if sep and key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def scan_sitemaps(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of a sitemap directory → one row per entry.

    One task per file (binaryFile does not split) — the sitemaps.org 50k
    URL/50 MB cap makes the file the right parallelism grain, same shape
    as the WARC segment scan."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.xml") if os.path.isdir(path) else path
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for e in parse_sitemap_xml(bytes(blob).decode("utf-8")):
                    rows.append({"sitemap": str(p), **e})
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        parse, SITEMAP_ENTRY_SCHEMA
    )


def write_sitemaps(df: DataFrame, out_dir: str) -> DataFrame:
    """Sitemap sink (the publisher side, used by tests/benches to build
    corpora): df(loc, lastmod, priority_hint) → one ``<urlset>`` file per
    non-empty partition plus one ``<sitemapindex>`` referencing them —
    exactly the 50k-cap directory layout ``scan_sitemaps`` consumes.

    Same discipline as the WARC sink: distributed mapInPandas write,
    temp-name + rename per file, O(#partitions) manifest return; only
    the tiny index document is written from the driver."""
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    cols = df.select("loc", "lastmod", "priority_hint")

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"urlset-{pid:05d}.xml")
        parts = [
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        ]
        n = 0
        for pdf in it:
            for loc, lastmod, hint in zip(
                pdf["loc"], pdf["lastmod"], pdf["priority_hint"]
            ):
                # sitemaps.org requires entity-escaped values; URLs with
                # query strings ('&') would otherwise produce a urlset the
                # reader rejects. ElementTree unescapes on read, so the
                # roundtrip stays byte-faithful.
                parts.append("<url><loc>%s</loc>" % xml_escape(loc))
                if lastmod is not None and not pd.isna(lastmod):
                    parts.append("<lastmod>%s</lastmod>" % xml_escape(str(lastmod)))
                if hint is not None and not pd.isna(hint):
                    parts.append("<priority>%.2f</priority>" % hint)
                parts.append("</url>")
                n += 1
        parts.append("</urlset>")
        if n:
            tmp = path + ".inprogress"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write("".join(parts))
            os.replace(tmp, path)
            yield pd.DataFrame({"path": [path], "urls": [n]})

    manifest = cols.mapInPandas(emit, "path string, urls long").collect()
    index = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for r in sorted(m["path"] for m in manifest):
        index.append("<sitemap><loc>file://%s</loc></sitemap>" % xml_escape(r))
    index.append("</sitemapindex>")
    # same temp-name + rename discipline as the urlset segments: a crash
    # mid-write must not leave a truncated index visible
    idx_path = os.path.join(out_dir, "sitemap-index.xml")
    with open(idx_path + ".inprogress", "w") as fh:
        fh.write("".join(index))
    os.replace(idx_path + ".inprogress", idx_path)
    return df.sparkSession.createDataFrame(
        manifest, "path string, urls long"
    )


def sitemap_seed_frontier(entries: DataFrame) -> DataFrame:
    """urlset rows → engine seed rows (url, priority, lastmod_date).

    priority = days(lastmod since 1970) * 10 + round(priority_hint * 9):
    recency dominates (the north star's article-recency score), the
    publisher's own 0.0-1.0 hint breaks same-day ties — integer math
    end-to-end, so the frontier ordering is reproducible bit-for-bit.
    Missing lastmod scores day 0 (oldest); missing hint scores 0.
    """
    return (
        entries.filter(F.col("kind") == "url")
        .withColumn("lastmod_date", F.to_date("lastmod"))
        .withColumn(
            "priority",
            F.coalesce(F.datediff("lastmod_date", F.lit("1970-01-01")), F.lit(0)).cast("long")
            * 10
            + F.round(F.coalesce(F.col("priority_hint"), F.lit(0.0)) * 9).cast("long"),
        )
        .select(F.col("loc").alias("url"), "priority", "lastmod_date")
    )
