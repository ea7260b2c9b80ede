"""Sources/sinks round trips + MERGE upsert + zip scan + version pick."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from review_crawler_spark.operators.version_pick import latest_versions
from review_crawler_spark.sources.jats import make_jats_xml
from review_crawler_spark.sources.sinks import (
    merge_upsert,
    read_csv_frontier,
    read_json_records,
    write_csv_frontier,
    write_json_records,
    zip_corpus_scan,
)


def test_zip_corpus_scan(spark, tmp_path):
    zp = tmp_path / "corpus.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for a in range(30):
            zf.writestr(f"articles/synth-{a}-v1.xml", make_jats_xml(a))
        zf.writestr("README.txt", b"not an article")

    df = zip_corpus_scan(spark, str(zp))
    assert df.count() == 31

    # name pre-filter pushed before payload read (plos_crawler.py:248-253)
    xml_only = zip_corpus_scan(spark, str(zp), name_filter=r"\.xml$")
    rows = xml_only.collect()
    assert len(rows) == 30
    assert all(bytes(r["bytes"]).startswith(b"<?xml") for r in rows[:3])


def test_version_pick_invariants(spark):
    """Port of test_elife_crawler.py:27-34: unique article ids, all .xml,
    newest version wins."""
    paths = [
        ("corpus/elife-00001-v1.xml",),
        ("corpus/elife-00001-v3.xml",),
        ("corpus/elife-00001-v2.xml",),
        ("corpus/elife-00002-v1.xml",),
        ("corpus/elife-00003-v2.xml",),
        ("corpus/elife-00003-v10.xml",),
        ("corpus/notes.txt",),           # dropped: wrong shape
        ("corpus/elife-9-draft.xml",),   # dropped: no -vN
    ]
    files = spark.createDataFrame(paths, "path string")
    out = latest_versions(files).collect()
    got = {r["article_id"]: r["version"] for r in out}
    assert got == {"00001": 3, "00002": 1, "00003": 10}
    assert all(r["path"].endswith(".xml") for r in out)
    assert len({r["article_id"] for r in out}) == len(out)


def test_json_roundtrip(spark, tmp_path):
    from review_crawler_spark.functions.parse import parse_jats_udf
    from review_crawler_spark.sources.corpus import jats_corpus

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    parsed = parse_jats_udf(jats_corpus(ids)).drop("sub_articles", "parse_error")
    out = str(tmp_path / "articles_json")
    write_json_records(parsed, out)
    back = read_json_records(spark, out, parsed.schema)
    assert back.count() == 40
    a = {r["doc_id"]: r["title"] for r in parsed.collect()}
    b = {r["doc_id"]: r["title"] for r in back.collect()}
    assert a == b


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.com/1", False), ("https://a.com/2", True)],
        "url string, skip boolean",
    )
    out = str(tmp_path / "urls_csv")
    write_csv_frontier(df, out)
    back = read_csv_frontier(spark, out, "url string, skip boolean")
    # F6 skip-list filter (mdpi_review_spider.py:53-55)
    kept = back.filter(~F.col("skip")).collect()
    assert [r["url"] for r in kept] == ["https://a.com/1"]


def test_merge_upsert(spark, tmp_path):
    table = str(tmp_path / "articles")
    v0 = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2")], "doi long, title string"
    )
    cur = merge_upsert(spark, table, v0, "doi")
    assert cur.count() == 2

    updates = spark.createDataFrame(
        [(2, "new-2"), (3, "new-3")], "doi long, title string"
    )
    cur = merge_upsert(spark, table, updates, "doi")
    got = {r["doi"]: r["title"] for r in cur.collect()}
    assert got == {1: "old-1", 2: "new-2", 3: "new-3"}

    # idempotent re-apply
    cur = merge_upsert(spark, table, updates, "doi")
    got = {r["doi"]: r["title"] for r in cur.collect()}
    assert got == {1: "old-1", 2: "new-2", 3: "new-3"}


def test_merge_upsert_prunes_untouched_buckets(spark, tmp_path):
    """A merge rewrites only buckets containing update keys; untouched
    buckets keep their exact files (manifest references them in place)."""
    import glob
    import json
    import os

    table = str(tmp_path / "bucketed")
    base = spark.createDataFrame(
        [(k, f"old-{k}") for k in range(40)], "doi long, title string"
    )
    merge_upsert(spark, table, base, "doi", num_buckets=8)
    with open(os.path.join(table, "_current")) as f:
        m0 = json.load(f)

    # one-key update → exactly one bucket rewritten
    upd = spark.createDataFrame([(7, "new-7")], "doi long, title string")
    before = {
        p: open(p, "rb").read()
        for rel in m0["buckets"].values()
        for p in glob.glob(os.path.join(table, rel, "*.parquet"))
    }
    cur = merge_upsert(spark, table, upd, "doi", num_buckets=8)
    with open(os.path.join(table, "_current")) as f:
        m1 = json.load(f)

    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m0["buckets"][b]]
    assert len(changed) == 1  # only the bucket holding doi=7
    for b, rel in m1["buckets"].items():
        if b in changed:
            continue
        for p in glob.glob(os.path.join(table, rel, "*.parquet")):
            assert open(p, "rb").read() == before[p]  # byte-identical

    got = {r["doi"]: r["title"] for r in cur.collect()}
    assert got[7] == "new-7" and got[6] == "old-6" and len(got) == 40


def test_validated_json_sink_accepts_good_rejects_bad(spark, tmp_path):
    """X23: exported JSON is validated against the article schema as a
    post-write gate (the reference's dormant validator, utils.py:58-64,
    json_schema/article_schema.json) — a violating row blocks the publish."""
    import os

    import pytest as _pytest

    from review_crawler_spark.sources.json_schema import (
        ARTICLE_EXPORT_SCHEMA,
        validated_write_json,
    )

    good = spark.createDataFrame(
        [("T", ["A B"], "https://doi.org/10.9999/x", "J", 2020, ["k"], False, True, 3)],
        "title string, authors array<string>, doi string, journal_title string, "
        "pub_year int, keywords array<string>, retracted boolean, "
        "has_reviews boolean, volume int",
    )
    out = str(tmp_path / "articles_json")
    validated_write_json(good, out, ARTICLE_EXPORT_SCHEMA)
    assert os.path.exists(out) and not os.path.exists(out + ".staging")
    assert spark.read.json(out).count() == 1

    # missing required 'doi' and wrong type for pub_year → rejected
    bad = spark.createDataFrame(
        [("T", ["A B"], "J", "notayear", ["k"], False, True)],
        "title string, authors array<string>, journal_title string, "
        "pub_year string, keywords array<string>, retracted boolean, "
        "has_reviews boolean",
    )
    with _pytest.raises(ValueError, match="schema validation failed"):
        validated_write_json(bad, str(tmp_path / "bad_json"), ARTICLE_EXPORT_SCHEMA)
    assert not os.path.exists(str(tmp_path / "bad_json"))

def test_merge_upsert_rejects_bucket_count_change(spark, tmp_path):
    """Bucket count is fixed at creation — a mismatched caller value is a
    ValueError (round-2 ADVICE: a bare assert vanishes under `python -O`
    and the mis-bucketed merge then silently keeps duplicate keys)."""
    import pytest

    from review_crawler_spark.sources.sinks import merge_upsert

    d = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    merge_upsert(spark, d, df, key="id", num_buckets=8)
    with pytest.raises(ValueError, match="fixed at table creation"):
        merge_upsert(spark, d, df, key="id", num_buckets=16)


def test_read_merged_empty_table(spark, tmp_path):
    """First merge with an empty frame → zero live buckets; read_merged
    answers a typed empty DataFrame instead of an empty-path read error."""
    from review_crawler_spark.sources.sinks import merge_upsert, read_merged

    d = str(tmp_path / "tbl")
    empty = spark.createDataFrame([], "id long, v string")
    merge_upsert(spark, d, empty, key="id", num_buckets=4)
    out = read_merged(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "v"]
