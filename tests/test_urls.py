from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from review_crawler_spark.functions.urls import canonicalize_one

URL_CHARS = st.text(
    alphabet="abcXYZ019/.-_~:@!$&'()*+,;=%?#", min_size=0, max_size=40
)


@given(
    scheme=st.sampled_from(["https://", "http://", "HTTPS://", "", "//"]),
    host=st.text(alphabet="abC09.-", min_size=1, max_size=12),
    tail=URL_CHARS,
)
@settings(max_examples=300, deadline=None)
def test_property_idempotent_and_total(scheme, host, tail):
    """canonicalize_one never raises and is idempotent on arbitrary junk."""
    url = scheme + host + tail
    c = canonicalize_one(url)
    assert isinstance(c, str)
    assert canonicalize_one(c) == c


@given(
    host=st.text(alphabet="ab09.-", min_size=1, max_size=10),
    path=st.text(alphabet="abz09/._-", min_size=0, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_property_fragment_and_case_invariance(host, path):
    """Canonical form is invariant to host case and (non-repair) fragments."""
    base = f"https://{host}/{path}"
    assert canonicalize_one(base.replace("https://", "HTTPS://")) == canonicalize_one(base)
    assert canonicalize_one(base + "#section-2") == canonicalize_one(base)


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


def test_fast_path_is_fixed_point():
    """Every URL the vectorized fast-path regex accepts must be a fixed
    point of the full canonicalizer (otherwise the fast path changes
    semantics)."""
    import random
    import re
    import string

    from review_crawler_spark.functions.urls import _FAST_CANONICAL

    rx = re.compile(_FAST_CANONICAL)
    rng = random.Random(42)
    chars = string.ascii_letters + string.digits + "/.-_~:@!$&'()*+,;=%?#"
    checked = 0
    for _ in range(20000):
        u = (
            "https://"
            + "".join(rng.choice("abc09.-") for _ in range(rng.randrange(1, 8)))
            + "".join(rng.choice(chars) for _ in range(rng.randrange(0, 24)))
        )
        if rx.match(u):
            checked += 1
            assert canonicalize_one(u) == u, u
    assert checked > 100  # the fast path actually triggers


def test_udf_tiers_match_reference():
    """The tiered batch canonicalizer (Arrow fast gate / vectorized
    repairs / lean query sort / urllib slow path) must agree with
    canonicalize_one on every input, including garbage ports, userinfo,
    stacked fragments, and None."""
    import random
    import string

    import pandas as pd

    from review_crawler_spark.functions import urls as U

    fn = U._canonicalize_batch
    rng = random.Random(3)
    chars = string.ascii_letters + string.digits + "/.-_~:@!$&'()*+,;=%?#"
    urls = []
    for _ in range(5000):
        scheme = rng.choice(["https://", "http://", "HTTPS://", "", "//"])
        host = "".join(rng.choice("abcABC09.-") for _ in range(rng.randrange(1, 10)))
        tail = "".join(rng.choice(chars) for _ in range(rng.randrange(0, 30)))
        urls.append(scheme + host + tail)
    # query-shaped fuzz hammers the lean-query tier, including the
    # adversarial prefix-key chunk orderings where a raw chunk sort would
    # diverge from canonicalize_one's (key, value) tuple sort
    for _ in range(5000):
        host = "".join(rng.choice("abc09.") for _ in range(rng.randrange(1, 6)))
        path = "/" + "".join(rng.choice("abc09./") for _ in range(rng.randrange(0, 8)))
        q = "".join(rng.choice("ab1=&") for _ in range(rng.randrange(0, 12)))
        urls.append(f"https://{host}{path}?{q}")
    urls += [
        "https://www.mdpi.com/2673-4087/2/3/21#review_report",
        "HTTPS://A.com:443/x/../y?b=2&a=1#frag",
        "https://user@a.com/x",
        "https://a.com:bogus/x",
        "https://a.com/p?a=1&a1=x",
        "https://a.com/p?a1=x&a=1",
        "https://a.com/p?b&a",
        "https://a.com/p?&&",
        "https://a.com/p?a==b&c=d=e",
        "https://a.com/./p?a=1",
        "https://a.com/p?a=1?b=2",
        None,
    ]
    got = fn(pd.Series(urls, dtype=object)).to_pylist()
    for u, g in zip(urls, got):
        expect = canonicalize_one(u) if u is not None else None
        assert g == expect, (u, g, expect)


def test_idempotent():
    urls = [
        "HTTPS://A.com:443/x/../y?b=2&a=1#frag",
        "www.mdpi.com/article/5#review_report",
    ]
    for u in urls:
        c = canonicalize_one(u)
        assert canonicalize_one(c) == c
