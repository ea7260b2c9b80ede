from __future__ import annotations

from review_crawler_spark.functions.urls import canonicalize_one


def test_scheme_host_lowercased():
    assert (
        canonicalize_one("HTTPS://WWW.MDPI.com/Article/1")
        == "https://www.mdpi.com/Article/1"
    )


def test_default_port_stripped():
    assert canonicalize_one("https://a.com:443/x") == "https://a.com/x"
    assert canonicalize_one("http://a.com:80/x") == "http://a.com/x"
    assert canonicalize_one("http://a.com:8080/x") == "http://a.com:8080/x"


def test_fragment_dropped_and_review_report_repair():
    # mdpi_review_spider.py:86-91 repair: #review_report → /review_report
    assert (
        canonicalize_one("https://www.mdpi.com/2673-4087/2/3/21#review_report")
        == "https://www.mdpi.com/2673-4087/2/3/21/review_report"
    )
    assert canonicalize_one("https://a.com/x#sec2") == "https://a.com/x"


def test_missing_scheme_repaired():
    assert canonicalize_one("www.mdpi.com/article/5") == "https://www.mdpi.com/article/5"


def test_query_params_sorted():
    assert (
        canonicalize_one("https://a.com/s?b=2&a=1&c=")
        == "https://a.com/s?a=1&b=2&c="
    )


def test_dot_segments_resolved():
    assert canonicalize_one("https://a.com/x/../y/./z") == "https://a.com/y/z"


def test_empty_path():
    assert canonicalize_one("https://a.com") == "https://a.com/"


def test_idempotent():
    urls = [
        "HTTPS://A.com:443/x/../y?b=2&a=1#frag",
        "www.mdpi.com/article/5#review_report",
    ]
    for u in urls:
        c = canonicalize_one(u)
        assert canonicalize_one(c) == c
