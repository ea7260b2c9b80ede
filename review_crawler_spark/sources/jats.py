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


def given_of(article_id: int, i: int) -> str:
    # distinct first letter per author within an article so contrib initials
    # (given[0]+surname[0]) are unique — exercises the reference's
    # initials-keyed email match (rarticle.py:417-512)
    return f"{chr(65 + (article_id + i) % 26)}iven{article_id}"


def surname_of(article_id: int, i: int) -> str:
    return f"Family{article_id}_{i}"


def authors_of(article_id: int) -> list[str]:
    return [
        f"{given_of(article_id, i)} {surname_of(article_id, i)}"
        for i in range(n_authors_of(article_id))
    ]


def initials_of(article_id: int, i: int) -> str:
    return given_of(article_id, i)[0] + surname_of(article_id, i)[0]


# -- affiliations (J3/X20: rid → institution, rarticle.py:351-382,647-672)

def n_affs_of(article_id: int) -> int:
    return 1 + article_id % 3


def aff_text_of(article_id: int, j: int) -> str:
    return f"Institute {(article_id * 7 + j) % 25}, City {(article_id + j) % 9}"


def author_aff_idx(article_id: int, i: int) -> int:
    """0-based affiliation index of author i (rid = aff{idx+1})."""
    return (article_id + i) % n_affs_of(article_id)


# -- corresponding author + emails (J4, rarticle.py:417-512,691-721)

def corr_author_idx(article_id: int) -> int:
    return article_id % n_authors_of(article_id)


def corr_email_of(article_id: int) -> str:
    return f"corr{article_id}@example{article_id % 5}.org"


def corr_email2_of(article_id: int) -> str:
    """Second address of a multi-email corresponding author."""
    return f"corr{article_id}.alt@example{article_id % 5}.org"


def corresp_shape_of(article_id: int) -> str:
    """Which of the reference's get_corr_author_emails branches
    (rarticle.py:417-512) this article's <author-notes> exercises:

    - ``initials_tail``    — <email>addr</email> AB          (a % 4 == 0)
    - ``multi_email_comma``— <email>a1</email>, <email>a2</email> AB
                             (comma-separated multi-email tail, a % 8 == 1)
    - ``paren_initials``   — <email>addr (AB)</email>        (a % 8 == 5)
    - ``fn_note``          — plain id-keyed email + an <fn> current-address
                             footnote xref'd by the corr author (a % 8 == 3)
    - ``regex_fallback``   — no <email> element at all; the address sits in
                             corresp text and only the reference's regex
                             scrape finds it                 (a % 8 == 7)
    - ``id_keyed``         — plain <email>addr</email>       (a % 8 ∈ {2,6})
    """
    if article_id % 4 == 0:
        return "initials_tail"
    m = article_id % 8
    if m == 1:
        return "multi_email_comma"
    if m == 5:
        return "paren_initials"
    if m == 3:
        return "fn_note"
    if m == 7:
        return "regex_fallback"
    return "id_keyed"


def corr_emails_of(article_id: int) -> list[str]:
    """All corresponding-author emails, in the parser's output order
    (sorted — the parse output sorts for representation stability; '.alt'
    sorts before '@')."""
    if corresp_shape_of(article_id) == "multi_email_comma":
        return sorted([corr_email_of(article_id), corr_email2_of(article_id)])
    return [corr_email_of(article_id)]


def fn_note_text_of(article_id: int) -> str:
    """Current-address footnote body (fn_note shape only)."""
    return f"Current address: Institute {(article_id * 11) % 25}"


def email_keyed_by_initials(article_id: int) -> bool:
    """Every 4th article writes the corr email with a trailing-initials tail
    (the reference's multi-corresponding-author shape)."""
    return article_id % 4 == 0


# -- history dates (X13, rarticle.py:233-330)

def epub_base_date(article_id: int):
    import datetime as _dt

    return _dt.date(
        pub_year_of(article_id),
        pub_month_of(article_id),
        pub_day_of(article_id) or 1,
    )


def received_date_of(article_id: int):
    import datetime as _dt

    return epub_base_date(article_id) - _dt.timedelta(days=30 + article_id % 60)


def dates_misordered(article_id: int) -> bool:
    return article_id % 37 == 0


def accepted_date_of(article_id: int):
    import datetime as _dt

    base = epub_base_date(article_id)
    if dates_misordered(article_id):
        return base + _dt.timedelta(days=3)  # accepted after epub → sanity fail
    return base - _dt.timedelta(days=article_id % 30)


# -- related articles (X17, rarticle.py:738-767)

def has_companion_of(article_id: int) -> bool:
    return article_id % 6 == 0


def companion_doi_of(article_id: int) -> str:
    return f"10.9999/synth.{article_id + 1}"


# -- taxonomy (rarticle.py:875-900)

def discipline_of(article_id: int) -> str:
    return f"Discipline{article_id % 8}"


def subdiscipline_of(article_id: int) -> str:
    return f"Sub{article_id % 20}"


# -- counts (A8, rarticle.py:1311-1355)

def page_count_of(article_id: int) -> int:
    return 5 + article_id % 20


def fig_count_of(article_id: int) -> int:
    return article_id % 4


def table_count_of(article_id: int) -> int:
    return article_id % 3


def counts_element_present(article_id: int) -> bool:
    """Odd articles carry explicit fig-count/table-count elements; even ones
    omit them so the parser must fall back to counting //fig and
    //table-wrap (mirrors rarticle.py:1338-1341)."""
    return article_id % 2 == 1


def word_count_of(article_id: int) -> int:
    # body text = "Synthetic body text for article {a}." (6 words) + extras
    return 6 + article_id % 5


def abstract_of(article_id: int) -> str:
    return (
        f"Abstract of study {article_id}: {article_id % 7} parameters "
        "considered."
    )


def license_href_of(article_id: int) -> str:
    major = 4 if article_id % 2 else 3
    return f"https://creativecommons.org/licenses/by/{major}.0/"


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


def sub_doi_num(article_id: int, rnd: int) -> int:
    """Sub-article DOI suffix number. Every 27th article numbers its
    sub-article DOIs sparsely (r2, r4, …) — the case where the reference's
    derive-N-from-DOI-suffix rule (plos_crawler.py:84-90) diverges from
    naive document-order counters."""
    return rnd * 2 if article_id % 27 == 0 else rnd


# ------------------------------------------------------------- JATS writer

def make_jats_xml(article_id: int) -> bytes:
    a = article_id
    corr_i = corr_author_idx(a)
    authors = "".join(
        f"<contrib contrib-type=\"author\"><name>"
        f"<surname>{surname_of(a, i)}</surname>"
        f"<given-names>{given_of(a, i)}</given-names>"
        f"</name>"
        f'<xref ref-type="aff" rid="aff{author_aff_idx(a, i) + 1}"/>'
        + ('<xref ref-type="corresp" rid="cor1"/>' if i == corr_i else "")
        + (
            '<xref ref-type="fn" rid="fn1"/>'
            if i == corr_i and corresp_shape_of(a) == "fn_note"
            else ""
        )
        + "</contrib>"
        for i in range(n_authors_of(a))
    )
    # half wrapped in addr-line, half bare text — both shapes the reference's
    # get_aff_dict handles (rarticle.py:351-382)
    affs = "".join(
        (
            f'<aff id="aff{j + 1}"><addr-line>{aff_text_of(a, j)}</addr-line></aff>'
            if (a + j) % 2 == 0
            else f'<aff id="aff{j + 1}">{aff_text_of(a, j)}</aff>'
        )
        for j in range(n_affs_of(a))
    )
    shape = corresp_shape_of(a)
    ini = initials_of(a, corr_i)
    if shape == "initials_tail":
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"<email>{corr_email_of(a)}</email> {ini}"
            "</corresp></author-notes>"
        )
    elif shape == "multi_email_comma":
        # one author, two addresses: comma tail on the first email, the
        # author's initials after the last (rarticle.py:468-489)
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"<email>{corr_email_of(a)}</email>, "
            f"<email>{corr_email2_of(a)}</email> {ini}"
            "</corresp></author-notes>"
        )
    elif shape == "paren_initials":
        # initials inside the email element's own text (rarticle.py:446-455)
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"<email>{corr_email_of(a)} ({ini})</email>"
            "</corresp></author-notes>"
        )
    elif shape == "fn_note":
        # plain id-keyed email plus a current-address footnote the corr
        # author xrefs (rarticle.py get_fn_dict :384-415)
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"<email>{corr_email_of(a)}</email>"
            "</corresp>"
            f'<fn id="fn1"><p>{fn_note_text_of(a)}</p></fn>'
            "</author-notes>"
        )
    elif shape == "regex_fallback":
        # no <email> element at all — only the text scrape finds it
        # (rarticle.py:506-512)
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"Contact email: {corr_email_of(a)} for correspondence"
            "</corresp></author-notes>"
        )
    else:
        corresp = (
            '<author-notes><corresp id="cor1">'
            f"<email>{corr_email_of(a)}</email>"
            "</corresp></author-notes>"
        )
    received = received_date_of(a)
    accepted = accepted_date_of(a)
    history = (
        "<history>"
        f'<date date-type="received"><day>{received.day}</day>'
        f"<month>{received.month}</month><year>{received.year}</year></date>"
        f'<date date-type="accepted"><day>{accepted.day}</day>'
        f"<month>{accepted.month}</month><year>{accepted.year}</year></date>"
        "</history>"
    )
    categories = (
        "<article-categories>"
        '<subj-group subj-group-type="heading">'
        "<subject>Research Article</subject></subj-group>"
        '<subj-group subj-group-type="Discipline-v3">'
        f"<subject>{discipline_of(a)}</subject>"
        f"<subj-group><subject>{subdiscipline_of(a)}</subject></subj-group>"
        "</subj-group>"
        "</article-categories>"
    )
    counts_xml = (
        "<counts>"
        + (
            f'<fig-count count="{fig_count_of(a)}"/>'
            f'<table-count count="{table_count_of(a)}"/>'
            if counts_element_present(a)
            else ""
        )
        + f'<page-count count="{page_count_of(a)}"/>'
        "</counts>"
    )
    permissions = (
        f"<permissions><copyright-year>{pub_year_of(a)}</copyright-year>"
        f'<license license-type="open-access" '
        f'xlink:href="{license_href_of(a)}">'
        "<license-p>Creative Commons</license-p></license></permissions>"
    )
    abstract_xml = f"<abstract><p>{escape(abstract_of(a))}</p></abstract>"
    kwds = "".join(f"<kwd>{k}</kwd>" for k in keywords_of(a))
    day = pub_day_of(a)
    day_xml = f"<day>{day}</day>" if day is not None else ""
    issue = issue_of(a)
    issue_xml = f"<issue>{issue}</issue>" if issue is not None else ""
    retract_xml = (
        '<related-article related-article-type="retracted-article" '
        f'xlink:href="info:doi/10.9999/synth.{a}"/>'
        if retracted_of(a)
        else ""
    )
    if has_companion_of(a):
        retract_xml += (
            '<related-article related-article-type="companion" '
            f'xlink:href="info:doi/{companion_doi_of(a)}"/>'
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
        num = sub_doi_num(a, rnd)
        subs.append(
            f'<sub-article article-type="aggregated-review-documents" id="sa{sub_idx}">'
            f"<front-stub>"
            f'<article-id pub-id-type="doi">10.9999/synth.{a}.r{num}</article-id>'
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
            f'<article-id pub-id-type="doi">10.9999/synth.{a}.a{num}</article-id>'
            f"<title-group><article-title>Author response {rnd}</article-title></title-group>"
            f"<custom-meta-group><custom-meta><meta-name>round</meta-name>"
            f"<meta-value>{rnd}</meta-value></custom-meta></custom-meta-group>"
            f"</front-stub></sub-article>"
        )
        sub_idx += 1
    if has_acceptance_letter(a):
        subs.append(
            f'<sub-article article-type="editor-report" specific-use="acceptance-letter" id="sa{sub_idx}">'
            f"<front-stub>"
            f'<article-id pub-id-type="doi">10.9999/synth.{a}.x1</article-id>'
            f"<title-group><article-title>Acceptance letter</article-title>"
            f"</title-group></front-stub></sub-article>"
        )

    body_inner = (
        f"<p>Synthetic body text for article {a}."
        + "".join(f" extra{w}" for w in range(a % 5))
        + "</p>"
        + "".join(f'<fig id="f{k}"/>' for k in range(fig_count_of(a)))
        + "".join(f'<table-wrap id="t{k}"/>' for k in range(table_count_of(a)))
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<article xmlns:xlink="http://www.w3.org/1999/xlink">'
        "<front>"
        "<journal-meta>"
        f"<journal-id journal-id-type=\"publisher\">{journal_abbrev_of(a)}</journal-id>"
        f"<journal-title-group><journal-title>{JOURNALS[a % 10]}</journal-title></journal-title-group>"
        "</journal-meta>"
        "<article-meta>"
        f'<article-id pub-id-type="doi">10.9999/synth.{a}</article-id>'
        f"{categories}"
        f"<title-group><article-title>{escape(title_of(a))}</article-title></title-group>"
        f"<contrib-group>{authors}</contrib-group>"
        f"{affs}"
        f"{corresp}"
        f'<pub-date pub-type="epub"><year>{pub_year_of(a)}</year>'
        f"<month>{pub_month_of(a)}</month>{day_xml}</pub-date>"
        f"<volume>{volume_of(a)}</volume>{issue_xml}"
        f"{history}"
        f"{permissions}"
        f"{abstract_xml}"
        f"<kwd-group>{kwds}</kwd-group>"
        f"{retract_xml}"
        f"{counts_xml}"
        "</article-meta>"
        "</front>"
        f"<body>{body_inner}</body>"
        + "".join(subs)
        + "</article>"
    )
    return xml.encode("utf-8")


def round_has_supp(article_id: int, rnd: int) -> bool:
    return (article_id + rnd) % 2 == 0


def doi_registered_of(article_id: int) -> bool:
    """Every 7th-ish article is early-access: its bib-identity DOI carries
    the '(registering DOI)' marker (mdpi_spider.py:8,89)."""
    return article_id % 7 != 3


def is_resubmission_of(article_id: int) -> bool:
    """Even reviewed articles are resubmissions: their review page repeats
    the earlier submission's reports below the REPEATING_REVIEWS notice
    (mdpi_review_spider.py:13)."""
    return has_reviews_of(article_id) and article_id % 2 == 0


def make_review_html(article_id: int) -> str:
    """Review-report page: rounds, per-round reviewer list, author response,
    supplementary-material links (what parse_reviews extracts,
    /root/reference/crawling/crawling/spiders/mdpi_review_spider.py:101-197).
    Resubmitted articles additionally repeat the earlier submission's review
    reports below the REPEATING_REVIEWS notice — a correct parser must stop
    there (mdpi_review_spider.py:13,122)."""
    from review_crawler_spark.functions.parse import REPEATING_REVIEWS

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
    if is_resubmission_of(a):
        # the repeated block is shaped exactly like live rounds so a parser
        # without the cutoff would over-extract it
        parts.append(f"<p>{REPEATING_REVIEWS}</p>")
        parts.append('<h2 class="round">Round 1</h2>')
        parts.append(
            '<div class="review"><span class="reviewer">'
            "Reviewer 1: Earlier Submission Reviewer</span></div>"
        )
        parts.append('<div class="author-response">Author response</div>')
    parts.append("</body></html>")
    return "".join(parts)


def make_dirty_html(article_id: int) -> str:
    """make_mdpi_html plus the junk real pages carry — script/style/
    noscript/link/rect subtrees and comments at fixed positions. Built so
    that clean_html(make_dirty_html(a)) == make_mdpi_html(a) exactly, which
    gives the S9 cleaner a closed-form whole-page oracle."""
    a = article_id
    clean = make_mdpi_html(a)
    head_junk = (
        f"<script type=\"text/javascript\">var trk={a};</script>"
        f"<style>.c{a} {{ color: red }}</style>"
        f'<link rel="stylesheet" href="/static/{a}.css">'
        f"<!-- render id {a} -->"
    )
    body_junk = (
        f"<noscript>enable js {a}</noscript>"
        f'<rect width="{a}" height="4"/>'
        f"<script>track({a});</script>"
    )
    dirty = clean.replace("<head>", "<head>" + head_junk, 1)
    return dirty.replace("</body>", body_junk + "</body>", 1)


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
    # bib-identity div: full DOI text, plus the '(registering DOI)' marker
    # on early-access articles (mdpi_spider.py:89 reads doi/doi_registered
    # out of exactly this div)
    body.append(
        f'<div class="bib-identity">{doi_of(a)}'
        + ("" if doi_registered_of(a) else " (registering DOI)")
        + "</div>"
    )
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
