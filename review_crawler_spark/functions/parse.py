"""Batch parse UDFs: U1 (JATS XML → article struct + sub-articles) and
U4 (HTML meta-tag extraction).

Re-expresses the reference's parse layer as Arrow-batched mapInPandas:
- U1 replaces ``parse_article_xml`` + the ``Article`` xpath property suite
  (/root/reference/plos_crawler.py:126-225, elife_crawler.py:101-196,
  rarticle.py title 985-999 / contributors 582-736 / dates 233-301 /
  keywords 1427-1439 / sub-articles 1404-1411) with a single ElementTree
  pass per document, batched over Arrow.
- U4 replaces the BeautifulSoup meta-tag scrape
  (/root/reference/crawling/crawling/spiders/mdpi_spider.py:49-106).

UDFs never raise: malformed input produces a ``parse_error`` column
(mirrors the reference's per-article try/except, plos_crawler.py:307-309).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame

ARTICLE_OUT_SCHEMA = (
    "doc_id bigint, doi string, short_doi string, title string, "
    "authors array<string>, journal_abbrev string, journal_title string, "
    "volume int, issue int, "
    "pub_year int, pub_month int, pub_day int, "
    "keywords array<string>, retracted boolean, has_reviews boolean, "
    "n_sub_articles int, "
    "sub_articles array<struct<id:string, original_article_doi:string, "
    "type:string, specific_use:string, round:int, "
    "reviewers:array<struct<number:int, name:string>>>>, "
    # J3/X20: rid→institution resolution (rarticle.py:351-382,647-672)
    "affiliations array<string>, author_affiliations array<string>, "
    # J4: corresponding-author emails keyed by corresp id or initials
    # (rarticle.py:417-512,691-721)
    "corr_email_keys array<string>, corr_emails array<string>, "
    "corr_author_surname string, "
    # X13: history dates + order sanity (rarticle.py:233-330)
    "received_date string, accepted_date string, dates_in_order boolean, "
    # X17: related-article dict flattened 'type|doi' (rarticle.py:738-767)
    "related_dois array<string>, "
    # taxonomy 'group_type:subject/subsubject' (rarticle.py:875-900)
    "taxonomy array<string>, "
    # A8: fig/table/page counts with xpath fallback + body word count
    # (rarticle.py:1311-1355)
    "fig_count int, table_count int, page_count int, word_count int, "
    "abstract string, license_type string, license_href string, "
    "parse_error string"
)

_XLINK_HREF = "{http://www.w3.org/1999/xlink}href"

HTML_OUT_SCHEMA = (
    "doc_id bigint, title string, doi string, journal_title string, "
    "volume int, pub_year int, pub_month int, authors array<string>, "
    "keywords array<string>, retracted boolean, doi_registered boolean, "
    "has_reviews boolean, reviews_url string, parse_error string"
)

_RETRACTION_RX = re.compile(r"Retraction published on \d+")
_META_RX = re.compile(r'<meta name="([^"]+)" content="([^"]*)">')
_REVIEW_LINK_RX = re.compile(r'<a href="([^"]*?/review_report)"')
# Crossref DOI pattern + ' (registering DOI)' suffix — an unregistered DOI
# marks an early-access page (mdpi_spider.py:7-8,89). Scoped to the
# bib-identity div when present, mirroring the reference's
# soup.find('div', {'class': 'bib-identity'}) extraction context.
_BIB_IDENTITY_RX = re.compile(
    r'<div class="bib-identity">(.*?)</div>', re.DOTALL
)
_UNREG_DOI_RX = re.compile(
    r"https://doi\.org/10.\d{4,9}/[-._;()/:a-zA-Z0-9]+\s+\(registering\s+DOI\)"
)


# --------------------------------------------------------------- U1: JATS

def parse_jats(data: bytes) -> dict:
    """Pure single-document JATS parse (shared by UDF and unit tests)."""
    root = ET.fromstring(data)
    meta = root.find("./front/article-meta")
    jmeta = root.find("./front/journal-meta")

    doi_el = meta.find('./article-id[@pub-id-type="doi"]')
    raw_doi = doi_el.text if doi_el is not None else None
    doi = f"https://doi.org/{raw_doi}" if raw_doi else None
    short_doi = raw_doi.rsplit("/", 1)[-1] if raw_doi else None

    title_el = meta.find("./title-group/article-title")
    authors = []
    for c in meta.findall('./contrib-group/contrib[@contrib-type="author"]'):
        giv = c.findtext("./name/given-names") or ""
        fam = c.findtext("./name/surname") or ""
        authors.append((giv + " " + fam).strip())

    def _int(el_text):
        try:
            return int(el_text) if el_text is not None else None
        except ValueError:
            return None

    pub = meta.find('./pub-date[@pub-type="epub"]')
    year = _int(pub.findtext("year")) if pub is not None else None
    month = _int(pub.findtext("month")) if pub is not None else None
    day = _int(pub.findtext("day")) if pub is not None else None

    keywords = [k.text for k in meta.findall("./kwd-group/kwd")]
    retracted = (
        meta.find('./related-article[@related-article-type="retracted-article"]')
        is not None
    )

    # ---- J3/X20: affiliation dict + contributor→institution resolution
    # (rarticle.py get_aff_dict :351-382; contributors :647-672). Both aff
    # shapes handled: <addr-line>-wrapped and bare text.
    aff_dict: dict[str, str] = {}
    for aff in meta.findall("./aff"):
        addr = aff.find("./addr-line")
        if addr is not None and addr.text:
            aff_dict[aff.get("id")] = " ".join(
                s.strip() for s in addr.text.splitlines()
            )
        elif aff.text:
            aff_dict[aff.get("id")] = (
                aff.text.replace("\n", "").replace("\r", "").replace("\t", "")
            )
    affiliations = list(aff_dict.values())

    # ---- fn_dict: author-notes footnotes (current addresses etc.) keyed by
    # id, resolved through contributors' fn xrefs (rarticle.py get_fn_dict
    # :384-415 — email children skipped, bare-text fns whitespace-scrubbed)
    notes = meta.find("./author-notes")
    fn_dict: dict[str, str] = {}
    if notes is not None:
        for el in notes:
            if not el.get("id") or el.tag == "corresp":
                continue
            kids = list(el)
            if kids:
                for sub in kids:
                    if sub.tag != "email" and sub.text:
                        fn_dict[el.get("id")] = sub.text
            elif el.text:
                fn_dict[el.get("id")] = (
                    el.text.replace("\n", "").replace("\r", "").replace("\t", "")
                )

    contribs = meta.findall('./contrib-group/contrib[@contrib-type="author"]')
    author_affiliations = []
    corr_rid_author = None  # surname of the contributor xref'd to <corresp>
    initials_index: dict[str, list[str]] = {}
    for c in contribs:
        giv = c.findtext("./name/given-names") or ""
        fam = c.findtext("./name/surname") or ""
        affs = [
            aff_dict.get(x.get("rid"), "")
            for x in c.findall('./xref[@ref-type="aff"]')
        ]
        # footnote-resolved institution info joins the aff list
        # (rarticle.py get_contributors_info pairs rid_dict with fn_dict)
        affs += [
            fn_dict[x.get("rid")]
            for x in c.findall('./xref[@ref-type="fn"]')
            if x.get("rid") in fn_dict
        ]
        author_affiliations.append("; ".join(affs))
        if c.find('./xref[@ref-type="corresp"]') is not None:
            corr_rid_author = fam
        if giv and fam:
            initials_index.setdefault(giv[0] + fam[0], []).append(fam)

    # ---- J4: corresponding-author emails (rarticle.py
    # get_corr_author_emails :417-512 — all four shapes): keyed by the
    # initials in the email's tail, by initials in parentheses inside the
    # email text, by the corresp id for plain single emails, with
    # comma-separated multi-email runs accumulating onto the closing
    # initials key, and a regex scrape of the notes text as last resort.
    corr_emails_map: dict[str, list[str]] = {}
    corresp = meta.find("./author-notes/corresp")
    if corresp is not None:
        pending: list[str] = []  # emails whose tail was just a comma
        for item in corresp:
            if item.tag != "email" or not item.text:
                continue
            text = item.text
            if "(" in text and ")" in text:
                # initials inside the email element: "addr (AB)"
                # (rarticle.py:446-455 — prune non [a-zA-Z0-9=@.+-])
                parts = [
                    re.sub(r"[^a-zA-Z0-9=@.+-]", "", p) for p in text.split(" ")
                ]
                if len(parts) >= 2:
                    corr_emails_map.setdefault(parts[1], []).append(parts[0])
                    continue
            tail_key = re.sub(r"[^a-zA-Z0-9=]", "", item.tail or "")
            if tail_key:
                # initials tail closes any comma-separated run before it
                corr_emails_map.setdefault(tail_key, []).extend(
                    pending + [text]
                )
                pending = []
            else:
                pending.append(text)
        if pending:
            corr_emails_map.setdefault(
                corresp.get("id") or "cor001", []
            ).extend(pending)
    if not corr_emails_map and notes is not None:
        # regex fallback over the notes' full text (rarticle.py:506-512)
        scraped = re.findall(
            r"[\w.-]+@[\w.-]+", " ".join(notes.itertext())
        )
        if scraped:
            corr_emails_map["cor001"] = scraped
    # match email key back to an author: unique-initials match first, else
    # the contributor carrying the corresp xref (rarticle.py:691-721)
    corr_author_surname = None
    for key in corr_emails_map:
        hit = initials_index.get(key)
        if hit and len(hit) == 1:
            corr_author_surname = hit[0]
            break
    if corr_author_surname is None:
        corr_author_surname = corr_rid_author

    # ---- X13: history dates (rarticle.py get_dates :233-301) + the
    # received ≤ accepted ≤ epub sanity of dates_debug (:303-330)
    def _hist_date(date_type):
        el = meta.find(f'./history/date[@date-type="{date_type}"]')
        if el is None:
            return None
        y, m, d = _int(el.findtext("year")), _int(el.findtext("month")), _int(
            el.findtext("day")
        )
        if y is None or m is None or d is None:
            return None
        return f"{y:04d}-{m:02d}-{d:02d}"

    received_date = _hist_date("received")
    accepted_date = _hist_date("accepted")
    epub_str = (
        f"{year:04d}-{month:02d}-{day or 1:02d}" if year and month else None
    )
    dates_in_order = True
    if received_date and accepted_date and epub_str:
        dates_in_order = received_date <= accepted_date <= epub_str
    elif received_date and epub_str:
        dates_in_order = received_date <= epub_str
    elif accepted_date and epub_str:
        dates_in_order = accepted_date <= epub_str

    # ---- X17: related-article type→DOI dict, flattened 'type|doi' in
    # document order (rarticle.py get_related_dois :738-767; their
    # lstrip('info:doi/') is a char-set strip — removeprefix is the intended
    # semantics and matches for PLOS DOIs, which start with '1')
    related_dois = []
    for rel in meta.findall("./related-article"):
        href = rel.get(_XLINK_HREF)
        if href is None:
            continue
        if href.startswith("info:doi/"):
            href = href[len("info:doi/"):]
        related_dois.append(f"{rel.get('related-article-type')}|{href}")

    # ---- taxonomy: subj-group type → nested subject chain
    # (rarticle.py taxonomy :875-900 — tuple(e.text for e in subj.iter()))
    taxonomy = []
    cats = meta.find("./article-categories")
    if cats is not None:
        for sg in cats.findall("./subj-group"):
            gtype = sg.get("subj-group-type") or "No subject"
            chain = "/".join(s.text or "" for s in sg.iter("subject"))
            taxonomy.append(f"{gtype}:{chain}")

    # ---- A8: counts with xpath fallback (rarticle.py counts :1311-1341)
    counts: dict[str, int] = {}
    counts_el = meta.find("./counts")
    if counts_el is not None:
        for item in counts_el:
            v = _int(item.get("count"))
            if v is not None:
                counts[item.tag] = v
    if "fig-count" not in counts:
        counts["fig-count"] = len(root.findall(".//fig"))
    if "table-count" not in counts:
        counts["table-count"] = len(root.findall(".//table-wrap"))

    # ---- word count over body text (rarticle.py word_count :1343-1355)
    body = root.find("./body")
    word_count = 0
    if body is not None:
        body_text = "".join(body.itertext())
        word_count = len(body_text.split(" "))

    # ---- abstract (rarticle.py abstract :1180-1207): attribute-less
    # <abstract>, text-serialized then whitespace-scrubbed
    abstract = None
    for ab in meta.findall("./abstract"):
        if not ab.attrib:
            abstract = "".join(ab.itertext()).strip().replace("  ", "")
            break

    # ---- license (rarticle.py license :1062-1066)
    lic = meta.find("./permissions/license")
    license_type = lic.get("license-type") if lic is not None else None
    license_href = lic.get(_XLINK_HREF) if lic is not None else None

    subs = []
    counters: dict[str, int] = {}
    for sa in root.findall("./sub-article"):
        sa_type = sa.get("article-type") or "unknown"
        specific_use = sa.get("specific-use")
        rnd = _int(sa.findtext("./front-stub/custom-meta-group/custom-meta/meta-value"))
        reviewers = []
        for rc in sa.findall('./front-stub/contrib-group/contrib[@contrib-type="reviewer"]'):
            reviewers.append(
                {
                    "number": _int(rc.findtext("./xref")),
                    "name": rc.findtext("./name/surname"),
                }
            )
        # id generation '<short>.r{N}' / '.a{N}' / '.x{N}': N comes from the
        # sub-article's OWN DOI suffix when present (plos_crawler.py:84-90 —
        # the reference rsplits the short doi on '.' and reads int(suffix[1:])),
        # falling back to a per-kind document-order counter for sub-articles
        # without an article-id (eLife style).
        kind = {"aggregated-review-documents": "r", "author-comment": "a"}.get(
            sa_type, "x"
        )
        counters[kind] = counters.get(kind, 0) + 1
        n = counters[kind]
        sub_doi = sa.findtext('./front-stub/article-id[@pub-id-type="doi"]')
        if sub_doi:
            splat = sub_doi.strip().rsplit("/", 1)[-1].rsplit(".", 1)
            if len(splat) == 2 and splat[1][1:].isdigit():
                n = int(splat[1][1:])
        subs.append(
            {
                "id": f"{short_doi}.{kind}{n}",
                "original_article_doi": doi,
                "type": sa_type,
                "specific_use": specific_use,
                "round": rnd,
                "reviewers": reviewers or None,
            }
        )

    return {
        "doi": doi,
        "short_doi": short_doi,
        "title": title_el.text if title_el is not None else None,
        "authors": authors,
        "journal_abbrev": jmeta.findtext('./journal-id[@journal-id-type="publisher"]')
        if jmeta is not None
        else None,
        "journal_title": jmeta.findtext("./journal-title-group/journal-title")
        if jmeta is not None
        else None,
        "volume": _int(meta.findtext("./volume")),
        "issue": _int(meta.findtext("./issue")),
        "pub_year": year,
        "pub_month": month,
        "pub_day": day,
        "keywords": keywords,
        "retracted": retracted,
        "has_reviews": len(subs) > 0,
        "n_sub_articles": len(subs),
        "sub_articles": subs,
        "affiliations": affiliations,
        "author_affiliations": author_affiliations,
        "corr_email_keys": sorted(corr_emails_map),
        "corr_emails": sorted(
            e for v in corr_emails_map.values() for e in v
        ),
        "corr_author_surname": corr_author_surname,
        "received_date": received_date,
        "accepted_date": accepted_date,
        "dates_in_order": dates_in_order,
        "related_dois": related_dois,
        "taxonomy": taxonomy,
        "fig_count": counts.get("fig-count"),
        "table_count": counts.get("table-count"),
        "page_count": counts.get("page-count"),
        "word_count": word_count,
        "abstract": abstract,
        "license_type": license_type,
        "license_href": license_href,
    }


def parse_jats_udf(corpus: DataFrame, id_col: str = "doc_id", bytes_col: str = "xml") -> DataFrame:
    """U1: corpus(doc_id, xml binary) → parsed article columns."""

    defaults = {
        "doi": None, "short_doi": None, "title": None, "authors": None,
        "journal_abbrev": None, "journal_title": None, "volume": None,
        "issue": None, "pub_year": None, "pub_month": None, "pub_day": None,
        "keywords": None, "retracted": None, "has_reviews": None,
        "n_sub_articles": None, "sub_articles": None,
        "affiliations": None, "author_affiliations": None,
        "corr_email_keys": None, "corr_emails": None,
        "corr_author_surname": None, "received_date": None,
        "accepted_date": None, "dates_in_order": None,
        "related_dois": None, "taxonomy": None,
        "fig_count": None, "table_count": None, "page_count": None,
        "word_count": None, "abstract": None, "license_type": None,
        "license_href": None,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bytes_col]):
                row = {"doc_id": doc_id, "parse_error": None, **defaults}
                try:
                    row.update(parse_jats(bytes(data)))
                except Exception as exc:  # noqa: BLE001 — isolate bad docs
                    row["parse_error"] = str(exc)[:200]
                out.append(row)
            yield pd.DataFrame(out)

    return corpus.mapInPandas(batches, schema=ARTICLE_OUT_SCHEMA)


# --------------------------------------------------------------- U4: HTML

def parse_html_meta(html: str) -> dict:
    """Pure single-page MDPI meta-tag extraction (regex; pages are
    machine-generated so the tag shape is fixed)."""
    metas: dict[str, list[str]] = {}
    for name, content in _META_RX.findall(html):
        metas.setdefault(name, []).append(unescape(content))

    def first(name):
        v = metas.get(name)
        return v[0] if v else None

    def _int(v):
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    pub = first("citation_publication_date")
    year, month = (None, None)
    if pub and "/" in pub:
        y, m = pub.split("/", 1)
        year, month = _int(y), _int(m)

    kw = first("citation_keywords")
    review_m = _REVIEW_LINK_RX.search(html)
    raw_doi = first("citation_doi")
    # doi_registered: True unless the bib-identity text carries the
    # '(registering DOI)' marker (mdpi_spider.py:89 — unregistered probably
    # means the article is in early access). Falls back to the whole page
    # when no bib-identity div exists (the marker requires an adjacent DOI,
    # so false positives can't arise elsewhere).
    bib_m = _BIB_IDENTITY_RX.search(html)
    scope = bib_m.group(1) if bib_m else html
    return {
        "title": first("citation_title"),
        "doi": f"https://doi.org/{raw_doi}" if raw_doi else None,
        "journal_title": first("citation_journal_title"),
        "volume": _int(first("citation_volume")),
        "pub_year": year,
        "pub_month": month,
        "authors": metas.get("citation_author", []),
        "keywords": kw.split("; ") if kw else [],
        "retracted": _RETRACTION_RX.search(html) is not None,
        "doi_registered": _UNREG_DOI_RX.search(scope) is None,
        "has_reviews": review_m is not None,
        "reviews_url": review_m.group(1) if review_m else None,
    }


REVIEW_OUT_SCHEMA = (
    "doc_id bigint, rounds array<struct<round:int, "
    "reviewers:array<struct<number:int,name:string>>, "
    "has_author_response:boolean, "
    "supp_urls:array<string>>>, n_rounds int, parse_error string"
)

_ROUND_RX = re.compile(r'<h2 class="round">Round (\d+)</h2>')
# number + name per reviewer, as the reference's {'number','name'} dicts
# (mdpi_review_spider.py:112-116: NUMBERS_PATTERN on texts[0], texts[1])
_REVIEWER_RX = re.compile(
    r'<span class="reviewer">Reviewer (\d+): ([^<]*)</span>'
)
_AUTHOR_RX = re.compile(r'<div class="author-response">')
_SUPP_RX = re.compile(r'<a class="supp" href="([^"]+)"')

# Resubmission notice: reviews listed after it were copied from an earlier
# submission and must not be re-extracted (mdpi_review_spider.py:13, and the
# `if REPEATING_REVIEWS in text: break` section-walk cutoff at line 122).
REPEATING_REVIEWS = (
    "This manuscript is a resubmission of an earlier submission. The "
    "following is a list of the peer review reports and author responses "
    "from that submission."
)


def parse_review_html(html: str) -> dict:
    """Review-report page → rounds with reviewers / responses / supp links.

    Round boundaries split the document; every extracted element belongs to
    the preceding Round header (document order), mirroring the reference's
    section walk (mdpi_review_spider.py:101-197). Content at or past the
    resubmission notice is dropped entirely (the reference breaks its walk
    there, mdpi_review_spider.py:122)."""
    cut = html.find(REPEATING_REVIEWS)
    if cut != -1:
        html = html[:cut]
    rounds = []
    matches = list(_ROUND_RX.finditer(html))
    for i, m in enumerate(matches):
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(html)
        chunk = html[start:end]
        rounds.append(
            {
                "round": int(m.group(1)),
                "reviewers": [
                    {"number": int(num), "name": unescape(name)}
                    for num, name in _REVIEWER_RX.findall(chunk)
                ],
                "has_author_response": _AUTHOR_RX.search(chunk) is not None,
                "supp_urls": _SUPP_RX.findall(chunk),
            }
        )
    return {"rounds": rounds, "n_rounds": len(rounds)}


def parse_review_html_udf(
    pages: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """U4b: review-report pages → per-round structs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                row = {"doc_id": doc_id, "rounds": None, "n_rounds": None,
                       "parse_error": None}
                try:
                    row.update(parse_review_html(html))
                except Exception as exc:  # noqa: BLE001
                    row["parse_error"] = str(exc)[:200]
                out.append(row)
            yield pd.DataFrame(out)

    return pages.mapInPandas(batches, schema=REVIEW_OUT_SCHEMA)


def parse_html_udf(pages: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    """U4: pages(doc_id, html string) → extracted metadata columns."""

    defaults = {
        "title": None, "doi": None, "journal_title": None, "volume": None,
        "pub_year": None, "pub_month": None, "authors": None,
        "keywords": None, "retracted": None, "doi_registered": None,
        "has_reviews": None, "reviews_url": None,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                row = {"doc_id": doc_id, "parse_error": None, **defaults}
                try:
                    row.update(parse_html_meta(html))
                except Exception as exc:  # noqa: BLE001
                    row["parse_error"] = str(exc)[:200]
                out.append(row)
            yield pd.DataFrame(out)

    return pages.mapInPandas(batches, schema=HTML_OUT_SCHEMA)
