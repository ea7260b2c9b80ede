"""Deterministic synthetic JATS XML + MDPI-style HTML corpus generators.

Stand-ins for the PLOS allofplos zip and eLife XML corpora
(/root/reference/plos_crawler.py:228-261, elife_crawler.py:199-242) and the
MDPI article HTML the spiders scrape (mdpi_spider.py:49-106). Every field is
a pure function of (article_id, host_seq), so the parse UDFs' outputs have a
closed-form oracle: SQL can reconstruct the expected title/DOI/authors/dates
arithmetically and the driver's value-hash verifies the whole
generate→serialize→parse round trip.

Structure mirrors real JATS: front/article-meta with title-group, contrib
authors, pub-date, journal-meta, kwd-group, plus <sub-article> elements for
reviews, author comments, decision letters and acceptance letters (the
latter filtered out downstream — F8, plos_crawler.py:177-180).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

JOURNALS = [f"Synthetic Journal {j}" for j in range(10)]


# ------------------------------------------------------------- field rules
# (closed-form; the SQL oracles replicate these expressions)

def doi_of(article_id: int) -> str:
    return f"https://doi.org/10.9999/synth.{article_id}"


def short_doi_of(article_id: int) -> str:
    return f"synth.{article_id}"


def title_of(article_id: int) -> str:
    return f"Synthetic study {article_id} on parameter {article_id % 7}"


def n_authors_of(article_id: int) -> int:
    return 1 + article_id % 4


def authors_of(article_id: int) -> list[str]:
    return [f"Given{article_id} Family{article_id}_{i}" for i in range(n_authors_of(article_id))]


def journal_abbrev_of(article_id: int) -> str:
    return f"synthj{article_id % 10}"


def volume_of(article_id: int) -> int:
    return 1 + article_id % 20


def issue_of(article_id: int) -> int | None:
    # eLife-style: some journals have no issue (elife_crawler.py:124)
    return None if article_id % 5 == 0 else 1 + article_id % 4


def pub_year_of(article_id: int) -> int:
    return 2015 + article_id % 10


def pub_month_of(article_id: int) -> int:
    return 1 + article_id % 12


def pub_day_of(article_id: int) -> int | None:
    # MDPI-style: day sometimes absent (mdpi_spider.py:67)
    return None if article_id % 3 == 0 else 1 + article_id % 28


def n_keywords_of(article_id: int) -> int:
    return article_id % 5


def keywords_of(article_id: int) -> list[str]:
    return [f"kw{(article_id * 3 + k) % 50}" for k in range(n_keywords_of(article_id))]


def retracted_of(article_id: int) -> bool:
    return article_id % 41 == 0


def has_reviews_of(article_id: int) -> bool:
    return article_id % 3 == 0


def n_rounds_of(article_id: int) -> int:
    return 1 + article_id % 3 if has_reviews_of(article_id) else 0


def has_acceptance_letter(article_id: int) -> bool:
    return has_reviews_of(article_id) and article_id % 9 == 0


def reviewer_name_of(article_id: int, rnd: int, num: int) -> str:
    # odd reviewer numbers stay anonymous (review_schema.json reviewer.name)
    if (article_id + num) % 2 == 1:
        return "Anonymous"
    return f"Reviewer{article_id}_{rnd}_{num}"


def n_reviewers_of(article_id: int, rnd: int) -> int:
    return 1 + (article_id + rnd) % 2


# ------------------------------------------------------------- JATS writer

def make_jats_xml(article_id: int) -> bytes:
    a = article_id
    authors = "".join(
        f"<contrib contrib-type=\"author\"><name>"
        f"<surname>Family{a}_{i}</surname><given-names>Given{a}</given-names>"
        f"</name></contrib>"
        for i in range(n_authors_of(a))
    )
    kwds = "".join(f"<kwd>{k}</kwd>" for k in keywords_of(a))
    day = pub_day_of(a)
    day_xml = f"<day>{day}</day>" if day is not None else ""
    issue = issue_of(a)
    issue_xml = f"<issue>{issue}</issue>" if issue is not None else ""
    retract_xml = (
        '<related-article related-article-type="retracted-article"/>'
        if retracted_of(a)
        else ""
    )

    subs = []
    sub_idx = 0
    for rnd in range(1, n_rounds_of(a) + 1):
        reviewers = "".join(
            f"<contrib contrib-type=\"reviewer\"><name>"
            f"<surname>{escape(reviewer_name_of(a, rnd, n))}</surname></name>"
            f"<xref>{n}</xref></contrib>"
            for n in range(1, n_reviewers_of(a, rnd) + 1)
        )
        subs.append(
            f'<sub-article article-type="aggregated-review-documents" id="sa{sub_idx}">'
            f"<front-stub>"
            f"<title-group><article-title>Review round {rnd}</article-title></title-group>"
            f"<contrib-group>{reviewers}</contrib-group>"
            f"<custom-meta-group><custom-meta><meta-name>round</meta-name>"
            f"<meta-value>{rnd}</meta-value></custom-meta></custom-meta-group>"
            f"</front-stub></sub-article>"
        )
        sub_idx += 1
        subs.append(
            f'<sub-article article-type="author-comment" id="sa{sub_idx}">'
            f"<front-stub>"
            f"<title-group><article-title>Author response {rnd}</article-title></title-group>"
            f"<custom-meta-group><custom-meta><meta-name>round</meta-name>"
            f"<meta-value>{rnd}</meta-value></custom-meta></custom-meta-group>"
            f"</front-stub></sub-article>"
        )
        sub_idx += 1
    if has_acceptance_letter(a):
        subs.append(
            f'<sub-article article-type="editor-report" specific-use="acceptance-letter" id="sa{sub_idx}">'
            f"<front-stub><title-group><article-title>Acceptance letter</article-title>"
            f"</title-group></front-stub></sub-article>"
        )

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<article>"
        "<front>"
        "<journal-meta>"
        f"<journal-id journal-id-type=\"publisher\">{journal_abbrev_of(a)}</journal-id>"
        f"<journal-title-group><journal-title>{JOURNALS[a % 10]}</journal-title></journal-title-group>"
        "</journal-meta>"
        "<article-meta>"
        f'<article-id pub-id-type="doi">10.9999/synth.{a}</article-id>'
        f"<title-group><article-title>{escape(title_of(a))}</article-title></title-group>"
        f"<contrib-group>{authors}</contrib-group>"
        f'<pub-date pub-type="epub"><year>{pub_year_of(a)}</year>'
        f"<month>{pub_month_of(a)}</month>{day_xml}</pub-date>"
        f"<volume>{volume_of(a)}</volume>{issue_xml}"
        f"<kwd-group>{kwds}</kwd-group>"
        f"{retract_xml}"
        "</article-meta>"
        "</front>"
        "<body><p>Synthetic body text for article {0}.</p></body>".format(a)
        + "".join(subs)
        + "</article>"
    )
    return xml.encode("utf-8")


def round_has_supp(article_id: int, rnd: int) -> bool:
    return (article_id + rnd) % 2 == 0


def make_review_html(article_id: int) -> str:
    """Review-report page: rounds, per-round reviewer list, author response,
    supplementary-material links (what parse_reviews extracts,
    /root/reference/crawling/crawling/spiders/mdpi_review_spider.py:101-197)."""
    a = article_id
    parts = ["<html><body><h1>Peer review report</h1>"]
    for rnd in range(1, n_rounds_of(a) + 1):
        parts.append(f'<h2 class="round">Round {rnd}</h2>')
        for n in range(1, n_reviewers_of(a, rnd) + 1):
            parts.append(
                f'<div class="review"><span class="reviewer">'
                f"Reviewer {n}: {escape(reviewer_name_of(a, rnd, n))}</span></div>"
            )
        parts.append('<div class="author-response">Author response</div>')
        if round_has_supp(a, rnd):
            parts.append(
                f'<a class="supp" href="https://www.mdpi.com/synth/{a}/supp/'
                f'round{rnd}-materials.zip">Supplementary material</a>'
            )
    parts.append("</body></html>")
    return "".join(parts)


# ------------------------------------------------------------- HTML writer

def make_mdpi_html(article_id: int) -> str:
    """MDPI-ish article page: citation meta tags + review link + retraction
    banner (what parse_article scrapes, mdpi_spider.py:49-106)."""
    a = article_id
    metas = [
        f'<meta name="citation_title" content="{escape(title_of(a))}">',
        f'<meta name="citation_doi" content="10.9999/synth.{a}">',
        f'<meta name="citation_volume" content="{volume_of(a)}">',
        f'<meta name="citation_publication_date" content="{pub_year_of(a)}/{pub_month_of(a)}">',
        f'<meta name="citation_journal_title" content="{JOURNALS[a % 10]}">',
    ]
    metas += [
        f'<meta name="citation_author" content="{escape(x)}">' for x in authors_of(a)
    ]
    if keywords_of(a):
        metas.append(
            '<meta name="citation_keywords" content="'
            + "; ".join(keywords_of(a))
            + '">'
        )
    body = []
    if retracted_of(a):
        body.append(f"<div>Retraction published on {pub_day_of(a) or 1} January 2024</div>")
    if has_reviews_of(a):
        body.append(
            f'<a href="https://www.mdpi.com/synth/{a}/review_report">Peer Review Report</a>'
        )
    return (
        "<html><head>" + "".join(metas) + "</head><body>"
        + "".join(body)
        + "</body></html>"
    )
