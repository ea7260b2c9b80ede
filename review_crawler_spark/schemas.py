"""Fixed StructType schemas for every engine table (FIXTURES.md).

The reference keeps schemas as dormant JSON Schema files
(/root/reference/json_schema/*.json, validation commented out at
/root/reference/utils.py:58-64); here they are enforced StructTypes —
inference is off everywhere for determinism.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- payload
# Authoritative shape from BASELINE.json input_hint: image + caption pairs.
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------- frontier
# Replaces Scrapy's in-memory priority queue (the engine schedules requests
# yielded at /root/reference/crawling/crawling/spiders/article_spider.py:66-68).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("state", T.StringType(), False),  # queued|fetched|failed
        T.StructField("attempt", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- url_seen
# Replaces Scrapy's RFPDupeFilter (default-on fingerprint set) and the
# fs-existence resume checks (/root/reference/plos_crawler.py:293-297).
URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("first_wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- articles
# Mirror of /root/reference/json_schema/article_schema.json:4-14 (required:
# title authors doi url journal publication_date keywords retracted
# has_reviews); golden fixture shape:
# /root/reference/tests/dumps/2673-4087_2_3_21.json.
REVIEWER_SCHEMA = T.StructType(
    [
        T.StructField("number", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)

SUPP_MATERIAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("original_filename", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)

# Mirror of sub_article_schema.json:3-6 (required: original_article_doi, type)
# + review_schema.json:4-7 (required: reviewer{name}, round).
SUB_ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("doi", T.StringType(), True),
        T.StructField("original_article_doi", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("specific_use", T.StringType(), True),
        T.StructField("round", T.IntegerType(), True),
        T.StructField("reviewers", T.ArrayType(REVIEWER_SCHEMA), True),
        T.StructField(
            "supplementary_materials", T.ArrayType(SUPP_MATERIAL_SCHEMA), True
        ),
    ]
)

ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("doi", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("authors", T.ArrayType(T.StringType()), True),
        T.StructField(
            "journal",
            T.StructType(
                [
                    T.StructField("abbrev", T.StringType(), True),
                    T.StructField("title", T.StringType(), True),
                    T.StructField("volume", T.IntegerType(), True),
                    # issue nullable: eLife has none
                    # (/root/reference/elife_crawler.py:124)
                    T.StructField("issue", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        # Date kept as {year,month,day} struct for fixture fidelity — the
        # reference has no native timestamp type (SURVEY.md §1.2); day is
        # nullable (MDPI omits it, mdpi_spider.py:67). A real DateType column
        # `pub_date` is derived engine-side with make_date().
        T.StructField(
            "publication_date",
            T.StructType(
                [
                    T.StructField("year", T.IntegerType(), True),
                    T.StructField("month", T.IntegerType(), True),
                    T.StructField("day", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("pub_date", T.DateType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("retracted", T.BooleanType(), True),
        T.StructField("doi_registered", T.BooleanType(), True),
        T.StructField("has_reviews", T.BooleanType(), True),
        T.StructField("reviews_url", T.StringType(), True),
        T.StructField("fulltext_pdf_url", T.StringType(), True),
        T.StructField("fulltext_xml_url", T.StringType(), True),
        T.StructField("fulltext_html_url", T.StringType(), True),
        T.StructField("sub_articles", T.ArrayType(SUB_ARTICLE_SCHEMA), True),
    ]
)

# ---------------------------------------------------------------- site graph
# Synthetic web standing in for live HTTP (no network in sandbox): the fetch
# stage is a join of scheduled frontier rows against this table on url.
OUT_LINK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

SITE_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # search|article|review_report|image
        T.StructField("page_no", T.IntegerType(), True),
        T.StructField("total_pages", T.IntegerType(), True),
        T.StructField("out_links", T.ArrayType(OUT_LINK_SCHEMA), True),
        T.StructField("status", T.IntegerType(), False),  # 200/403/404
        T.StructField("pub_year", T.IntegerType(), True),  # recency for priority
        T.StructField("has_reviews", T.BooleanType(), True),
    ]
)

# ---------------------------------------------------------------- fetched
# Exactly what CrawlEngine.run_wave commits per wave; global crawl order is
# derived, not stored: ORDER BY (wave, priority DESC, host, seq).
FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("status", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- metrics
# Per-wave, per-host lineage rows — the checkpoint evidence the north
# rule asks for (counters in the reference: plos_crawler.py:286-312).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("urls_fetched", T.LongType(), False),
        T.StructField("urls_admitted", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------- journals dim
JOURNALS_SCHEMA = T.StructType(
    [
        T.StructField("abbrev", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
    ]
)
