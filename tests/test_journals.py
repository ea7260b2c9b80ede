from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.sources.journals import (
    journals_dim,
    parse_journals_text,
    synthetic_journals_json,
)


def test_clean_json_fast_path():
    text = json.dumps({"neurosci": "NeuroSci", "info": "Information"})
    assert parse_journals_text(text) == [
        ("info", "Information"),
        ("neurosci", "NeuroSci"),
    ]


def test_dirty_json_salvage_recovers_all_rows():
    text = synthetic_journals_json(40, corrupt_line=17)
    with pytest.raises(json.JSONDecodeError):
        json.loads(text)  # prove the fixture is actually broken
    pairs = parse_journals_text(text)
    assert len(pairs) == 40
    assert ("journal17", "Journal 17") in pairs  # the corrupted line's pair


def test_dim_broadcast_join(spark):
    dim = journals_dim(spark, synthetic_journals_json(10))
    facts = spark.createDataFrame(
        [(f"journal{i % 10}", i) for i in range(50)], "abbrev string, n long"
    )
    joined = facts.join(F.broadcast(dim), "abbrev")
    assert joined.count() == 50
    assert joined.filter(F.col("title").isNull()).count() == 0
