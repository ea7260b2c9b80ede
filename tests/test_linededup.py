from __future__ import annotations

from collections import Counter

import pytest

from review_crawler_spark.operators.linededup import line_dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BOILER = "accept cookies"


def test_drops_corpus_repeated_lines_preserves_order(spark):
    texts = [
        f"{BOILER}\nunique one\nmiddle\n{BOILER}",
        f"intro\n{BOILER}\nunique two",
        "only original\ncontent here",
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, texts), max_occurrences=1).collect()
    }
    assert out[0]["n_lines"] == 4 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == "unique one\nmiddle"
    assert out[1]["clean_text"] == "intro\nunique two"
    assert out[2]["clean_text"] == "only original\ncontent here"
    assert out[2]["n_kept"] == 2


def test_all_boilerplate_doc_survives_empty(spark):
    texts = [BOILER, BOILER, "real\n" + BOILER]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, texts), max_occurrences=2).collect()
    }
    # BOILER occurs 3 times > 2 -> dropped everywhere
    assert out[0]["clean_text"] == "" and out[0]["n_kept"] == 0
    assert out[0]["n_lines"] == 1
    assert out[2]["clean_text"] == "real"


def test_threshold_counts_total_occurrences(spark):
    # a line repeated twice INSIDE one doc counts as 2 occurrences
    texts = ["dup\ndup\nkeep me"]
    out = line_dedup(_docs(spark, texts), max_occurrences=1).collect()[0]
    assert out["clean_text"] == "keep me"
    out2 = line_dedup(_docs(spark, texts), max_occurrences=2).collect()[0]
    assert out2["clean_text"] == "dup\ndup\nkeep me"


def test_matches_python_reference_on_random_corpus(spark):
    import random

    rng = random.Random(11)
    vocab = [f"line{i}" for i in range(12)]
    texts = [
        "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    k = 3
    counts = Counter(ln for t in texts for ln in t.split("\n"))
    expect = {}
    for i, t in enumerate(texts):
        kept = [ln for ln in t.split("\n") if counts[ln] <= k]
        expect[i] = (len(t.split("\n")), len(kept), "\n".join(kept))
    got = line_dedup(_docs(spark, texts), max_occurrences=k).collect()
    assert len(got) == len(texts)
    for r in got:
        assert (r["n_lines"], r["n_kept"], r["clean_text"]) == expect[r["doc_id"]]


def test_rejects_bad_threshold(spark):
    with pytest.raises(ValueError):
        line_dedup(_docs(spark, ["x"]), max_occurrences=0)
