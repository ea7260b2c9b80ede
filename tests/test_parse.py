"""Parser golden tests — port of the reference's parser test strategy
(/root/reference/tests/test_elife_crawler.py):

- golden-linkage: every sub-article's original_article_doi == parent doi
  (test_elife_crawler.py:40-41)
- a known article has reviews (test_elife_crawler.py:36-39)
- randomized corpus sample parses with a doi and ≥1 author
  (test_elife_crawler.py:43-46)
- golden fixture equality for one fully-specified article
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.functions.parse import (
    parse_html_meta,
    parse_html_udf,
    parse_jats,
    parse_jats_udf,
)
from review_crawler_spark.sources import jats as G
from review_crawler_spark.sources.corpus import html_corpus, jats_corpus


def test_golden_fixture_article_12():
    """Fully-specified expected parse for article 12 (has reviews: 12%3==0,
    rounds=1+12%3=1, no acceptance letter since 12%9!=0)."""
    got = parse_jats(G.make_jats_xml(12))
    assert got["doi"] == "https://doi.org/10.9999/synth.12"
    assert got["short_doi"] == "synth.12"
    assert got["title"] == "Synthetic study 12 on parameter 5"
    assert got["authors"] == ["Miven12 Family12_0"]
    assert got["journal_abbrev"] == "synthj2"
    assert got["volume"] == 13
    assert got["issue"] == 1
    assert (got["pub_year"], got["pub_month"], got["pub_day"]) == (2017, 1, None)
    assert got["keywords"] == ["kw36", "kw37"]
    assert got["retracted"] is False
    assert got["has_reviews"] is True
    assert got["n_sub_articles"] == 2
    review, reply = got["sub_articles"]
    assert review["id"] == "synth.12.r1"
    assert review["type"] == "aggregated-review-documents"
    assert review["round"] == 1
    assert review["reviewers"][0]["number"] == 1
    assert reply["id"] == "synth.12.a1"
    assert reply["type"] == "author-comment"


def test_sub_article_linkage_random_sample():
    rng = random.Random(42)
    for _ in range(100):
        a = rng.randrange(0, 10_000)
        got = parse_jats(G.make_jats_xml(a))
        assert got["doi"] == G.doi_of(a)
        assert len(got["authors"]) >= 1
        for sub in got["sub_articles"]:
            assert sub["original_article_doi"] == got["doi"]


def test_acceptance_letter_present_when_expected():
    got = parse_jats(G.make_jats_xml(9))  # 9%3==0 and 9%9==0
    uses = [s["specific_use"] for s in got["sub_articles"]]
    assert "acceptance-letter" in uses


def test_html_meta_roundtrip():
    for a in (0, 7, 12, 41, 82):
        got = parse_html_meta(G.make_mdpi_html(a))
        assert got["title"] == G.title_of(a)
        assert got["doi"] == G.doi_of(a)
        assert got["authors"] == G.authors_of(a)
        assert got["keywords"] == G.keywords_of(a)
        assert got["has_reviews"] == G.has_reviews_of(a)
        assert got["retracted"] == G.retracted_of(a)
        if got["has_reviews"]:
            assert got["reviews_url"].endswith("/review_report")


@pytest.fixture(scope="module")
def parsed(spark):
    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    corpus = jats_corpus(ids)
    return parse_jats_udf(corpus).cache()


def test_udf_no_parse_errors(parsed):
    assert parsed.filter(F.col("parse_error").isNotNull()).count() == 0
    assert parsed.count() == 200


def test_udf_explode_linkage(parsed):
    exploded = parsed.select(
        "doi", F.explode("sub_articles").alias("sub")
    )
    bad = exploded.filter(F.col("sub.original_article_doi") != F.col("doi"))
    assert bad.count() == 0


def test_udf_acceptance_letter_filter(parsed):
    """F8: filter specific_use == 'acceptance-letter'
    (plos_crawler.py:177-180)."""
    exploded = parsed.select(F.explode("sub_articles").alias("sub"))
    kept = exploded.filter(
        F.col("sub.specific_use").isNull()
        | (F.col("sub.specific_use") != "acceptance-letter")
    )
    n_all = exploded.count()
    n_kept = kept.count()
    n_acc = sum(
        1 for a in range(200) if G.has_acceptance_letter(a)
    )
    assert n_all - n_kept == n_acc


def test_udf_isolates_malformed_xml(spark):
    corpus = spark.createDataFrame(
        [(1, G.make_jats_xml(1)), (2, b"<article><unclosed")],
        "doc_id long, xml binary",
    )
    out = {r["doc_id"]: r for r in parse_jats_udf(corpus).collect()}
    assert out[1]["parse_error"] is None
    assert out[2]["parse_error"] is not None  # never throws


def test_html_udf(spark):
    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    out = parse_html_udf(html_corpus(ids))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 60
    assert rows[0]["parse_error"] is None
    n_rev = sum(1 for r in rows.values() if r["has_reviews"])
    assert n_rev == sum(1 for a in range(60) if G.has_reviews_of(a))


def test_review_html_roundtrip():
    from review_crawler_spark.functions.parse import parse_review_html

    for a in (3, 9, 12, 21, 30):
        got = parse_review_html(G.make_review_html(a))
        assert got["n_rounds"] == G.n_rounds_of(a)
        for r in got["rounds"]:
            rnd = r["round"]
            assert len(r["reviewers"]) == G.n_reviewers_of(a, rnd)
            # {'number','name'} per reviewer (mdpi_review_spider.py:112-116)
            assert r["reviewers"] == [
                {"number": n, "name": G.reviewer_name_of(a, rnd, n)}
                for n in range(1, G.n_reviewers_of(a, rnd) + 1)
            ]
            assert r["has_author_response"]
            assert len(r["supp_urls"]) == (1 if G.round_has_supp(a, rnd) else 0)


def test_review_resubmission_notice_cuts_walk():
    """Reviews repeated from an earlier submission (below REPEATING_REVIEWS,
    mdpi_review_spider.py:13,122) must not be re-extracted: 12 and 30 are
    resubmissions, so their pages carry a decoy Round block past the notice
    that a cutoff-less parser would count as an extra round."""
    from review_crawler_spark.functions.parse import (
        REPEATING_REVIEWS,
        parse_review_html,
    )

    for a in (12, 30):
        assert G.is_resubmission_of(a)
        html = G.make_review_html(a)
        assert REPEATING_REVIEWS in html
        got = parse_review_html(html)
        assert got["n_rounds"] == G.n_rounds_of(a)
        assert all(
            rv["name"] != "Earlier Submission Reviewer"
            for r in got["rounds"]
            for rv in r["reviewers"]
        )


def test_doi_registered_marker():
    """'(registering DOI)' in bib-identity → doi_registered False
    (mdpi_spider.py:8,89); every other page parses True."""
    from review_crawler_spark.functions.parse import parse_html_meta

    for a in (0, 3, 10, 17, 24, 41):
        got = parse_html_meta(G.make_mdpi_html(a))
        assert got["doi_registered"] == G.doi_registered_of(a)
        assert got["doi_registered"] == (a % 7 != 3)


def test_review_html_no_rounds_for_unreviewed():
    from review_crawler_spark.functions.parse import parse_review_html

    got = parse_review_html(G.make_review_html(1))  # 1 % 3 != 0
    assert got["n_rounds"] == 0 and got["rounds"] == []


def test_random_articles_reference_contract():
    """Mirrors /root/reference/tests/test_elife_crawler.py:36-47: every
    article parses with a doi, non-empty authors, and sub-articles that link
    back to their parent doi; extended fields are populated."""
    import random

    from review_crawler_spark.functions.parse import parse_jats

    rng = random.Random(42)
    for a in rng.sample(range(100000), 100):
        res = parse_jats(G.make_jats_xml(a))
        assert res["doi"] and res["doi"].startswith("https://doi.org/")
        assert len(res["authors"]) > 0
        for sub_a in res["sub_articles"]:
            assert sub_a["original_article_doi"] == res["doi"]
        if G.has_reviews_of(a):
            assert res["has_reviews"]
        # extended rarticle field surface (round-2 parity)
        assert len(res["affiliations"]) == G.n_affs_of(a)
        assert len(res["author_affiliations"]) == len(res["authors"])
        assert res["corr_emails"] == G.corr_emails_of(a)
        assert res["corr_author_surname"] == G.surname_of(a, G.corr_author_idx(a))
        assert res["received_date"] == G.received_date_of(a).isoformat()
        assert res["accepted_date"] == G.accepted_date_of(a).isoformat()
        assert res["dates_in_order"] == (not G.dates_misordered(a))
        assert res["fig_count"] == G.fig_count_of(a)
        assert res["table_count"] == G.table_count_of(a)
        assert res["page_count"] == G.page_count_of(a)
        assert res["word_count"] == G.word_count_of(a)
        assert res["license_href"] == G.license_href_of(a)


def test_corr_email_all_reference_shapes():
    """J4 full branch parity with rarticle.py get_corr_author_emails
    (:417-512): initials tail, corresp-id keyed, comma-separated multi-email
    runs, initials-in-parentheses, footnote current addresses (get_fn_dict
    :384-415), and the regex text scrape of last resort (:506-512). Every
    shape must still resolve the corresponding author's surname."""
    from review_crawler_spark.functions.parse import parse_jats

    res = parse_jats(G.make_jats_xml(8))  # initials_tail
    assert G.corresp_shape_of(8) == "initials_tail"
    assert res["corr_email_keys"] == [G.initials_of(8, G.corr_author_idx(8))]
    assert res["corr_emails"] == [G.corr_email_of(8)]

    res = parse_jats(G.make_jats_xml(6))  # id_keyed
    assert G.corresp_shape_of(6) == "id_keyed"
    assert res["corr_email_keys"] == ["cor1"]
    assert res["corr_emails"] == [G.corr_email_of(6)]

    res = parse_jats(G.make_jats_xml(9))  # multi_email_comma
    assert G.corresp_shape_of(9) == "multi_email_comma"
    assert res["corr_email_keys"] == [G.initials_of(9, G.corr_author_idx(9))]
    assert res["corr_emails"] == G.corr_emails_of(9)

    res = parse_jats(G.make_jats_xml(5))  # paren_initials
    assert G.corresp_shape_of(5) == "paren_initials"
    assert res["corr_email_keys"] == [G.initials_of(5, G.corr_author_idx(5))]
    assert res["corr_emails"] == [G.corr_email_of(5)]

    res = parse_jats(G.make_jats_xml(11))  # fn_note
    assert G.corresp_shape_of(11) == "fn_note"
    assert res["corr_email_keys"] == ["cor1"]
    corr_i = G.corr_author_idx(11)
    assert res["author_affiliations"][corr_i].endswith(
        "; " + G.fn_note_text_of(11)
    )
    # non-corr authors carry no footnote suffix
    for i, aa in enumerate(res["author_affiliations"]):
        if i != corr_i:
            assert "Current address" not in aa

    res = parse_jats(G.make_jats_xml(7))  # regex_fallback
    assert G.corresp_shape_of(7) == "regex_fallback"
    assert res["corr_email_keys"] == ["cor001"]
    assert res["corr_emails"] == [G.corr_email_of(7)]

    # every shape resolves the corresponding author's surname
    for a in (5, 6, 7, 8, 9, 11):
        res = parse_jats(G.make_jats_xml(a))
        assert res["corr_author_surname"] == G.surname_of(
            a, G.corr_author_idx(a)
        ), (a, G.corresp_shape_of(a))
