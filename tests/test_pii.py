from __future__ import annotations

import re

from pyspark.sql import functions as F

from review_crawler_spark.functions.pii import REDACT_ORDER, pii_scrub


def _rows(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


def test_counts_and_redaction(spark):
    texts = [
        "mail a.b-c_d%x@sub.example.org or root@h.io now",
        "server at 10.0.0.1 and 192.168.255.254, call +1-555-0134",
        "no pii here at all",
        "+44-555-9999 then email@example.com on 8.8.8.8",
    ]
    out = {
        r["id"]: r
        for r in pii_scrub(_rows(spark, texts)).collect()
    }
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 1)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (1, 1, 1)
    assert out[0]["redacted"] == "mail <EMAIL> or <EMAIL> now"
    assert out[1]["redacted"] == "server at <IP> and <IP>, call <PHONE>"
    assert out[2]["redacted"] == "no pii here at all"
    assert out[3]["redacted"] == "<PHONE> then <EMAIL> on <IP>"


def test_matches_python_re_on_random_soup(spark):
    # the Spark (Java regex) path and Python re must agree on the shared
    # pattern subset — fuzz over structured noise
    import random

    rng = random.Random(7)
    atoms = [
        "x@y.io", "a.b@c.co.uk", "1.2.3.4", "999.1.1.1", "+1-555-0000",
        "word", "a@b", "10.0.0", "+12-123-4567", "x@@y.z", "7.7.7.7.7",
    ]
    texts = [
        " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    got = pii_scrub(_rows(spark, texts)).orderBy("id").collect()
    for t, r in zip(texts, got):
        red = t
        for name, pat, token in REDACT_ORDER:
            # counts are defined over the ORIGINAL text, redaction chains
            assert r[f"n_{name}"] == len(re.findall(pat, t)), (name, t)
            red = re.sub(pat, token, red)
        assert r["redacted"] == red, t


def test_redaction_is_idempotent(spark):
    texts = ["u@v.org 1.2.3.4 +1-555-1234"]
    once = pii_scrub(_rows(spark, texts)).select("id", "redacted")
    twice = pii_scrub(once.withColumnRenamed("redacted", "text")).collect()
    assert twice[0]["redacted"] == "<EMAIL> <IP> <PHONE>"
    assert (twice[0]["n_email"], twice[0]["n_ipv4"], twice[0]["n_phone"]) == (
        0,
        0,
        0,
    )


def test_plan_is_narrow(spark):
    df = pii_scrub(_rows(spark, ["a@b.cc"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
