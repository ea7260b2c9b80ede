"""Main-content extraction (boilerplate removal) for fetched HTML pages.

The crawl→training-corpus step the reference stops short of: it dumps
cleaned whole pages (``article_spider.py:168-180`` strips script/style and
sinks ``str(soup)``), leaving nav bars, footers and link lists inside the
text a downstream pipeline trains on.  Every production web corpus
(CCNet, RefinedWeb, FineWeb) inserts a main-content extractor
(trafilatura / resiliparse / boilerpipe) between fetch and dedup.  This is
that stage, re-expressed as pure JVM expressions — a simplified
Kohlschuetter et al., WSDM'10 ("Boilerplate Detection using Shallow Text
Features") block classifier:

1. split the page into text blocks at block-level tag boundaries
   (``p/div/li/h1..h6/td/tr/table/ul/ol/article/section/header/footer/
   nav/blockquote/pre/br/body/html/head/title``),
2. per block compute integer-exact shallow features — normalized text
   length, word count, and anchor-text length (the characters that sit
   inside ``<a>..</a>``),
3. a block is CONTENT iff it has at least ``min_words`` words AND its
   link density is at most ``max_link_den`` — evaluated as the integer
   cross-multiplication ``anchor_len * den <= text_len * num`` so the
   verdict is bit-stable across engines (house rule: never float ratios),
4. the page's main text is the content blocks joined in document order.

Scale shape: one codegen'd projection per page — split / transform /
aggregate / filter / array_join are all Catalyst expressions, zero Python,
zero shuffle, so the pass pipelines with the parquet scan over a
billion-page fetched log exactly like ``clean_html`` (S9) does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level elements: opening OR closing tags end the current text block.
_BLOCK_TAGS = (
    "p|div|li|ul|ol|h[1-6]|td|th|tr|table|article|section|header|footer"
    "|nav|aside|blockquote|pre|br|hr|body|html|head|title|figure|figcaption"
)
BLOCK_SPLIT_PATTERN = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>"

# Anchor subtrees: group 1 is the raw inner HTML of each <a>..</a>.
_ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def _norm_text(raw: Column) -> Column:
    """Strip remaining inline tags, collapse whitespace, trim."""
    no_tags = F.regexp_replace(raw, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def _let(value: Column, body) -> Column:
    """Let-bind ``value`` to a lambda variable so ``body`` can reference it
    several times with ONE evaluation: ``element_at(transform(array(v),
    x -> body(x)), 1)``. Higher-order-function lambdas are interpreted
    (no whole-stage codegen, no common-subexpression elimination), so
    without the binding every reference re-evaluates the full expression
    tree — the pre-round-6 block classifier re-ran the normalize regexes
    3× per block and the whole block pipeline once per output column."""
    return F.element_at(F.transform(F.array(value), body), 1)


def block_features(block: Column) -> Column:
    """Shallow features of one raw block fragment as a struct.

    ``text`` is the normalized visible text, ``text_len``/``word_count``
    its integer size, ``anchor_len`` the normalized length of text inside
    anchors (0 for linkless blocks). The normalized text is computed once
    per block (let-bound), not once per struct field.
    """
    anchors = F.regexp_extract_all(block, F.lit(_ANCHOR_PATTERN), F.lit(1))
    anchor_len = F.aggregate(
        F.transform(anchors, lambda a: F.length(_norm_text(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return _let(
        _norm_text(block),
        lambda text: F.struct(
            text.alias("text"),
            F.length(text).alias("text_len"),
            F.when(F.length(text) == 0, F.lit(0))
            .otherwise(F.size(F.split(text, " ")))
            .alias("word_count"),
            anchor_len.alias("anchor_len"),
        ),
    )


def main_content_blocks(
    df: DataFrame,
    html_col: str = "html",
    *,
    min_words: int = 5,
    max_link_den: tuple[int, int] = (1, 3),
) -> DataFrame:
    """Explode pages into classified text blocks.

    Adds ``block_idx`` (document order among non-empty blocks), the
    shallow-feature columns, and the boolean ``is_content`` verdict.
    ``max_link_den`` is a (numerator, denominator) rational — the default
    (1, 3) keeps blocks whose anchor text is at most a third of the text.
    """
    num, den = max_link_den
    feats = F.transform(
        F.split(F.col(html_col), BLOCK_SPLIT_PATTERN),
        lambda b: block_features(b),
    )
    nonempty = F.filter(feats, lambda s: s["text_len"] > 0)
    out = df.select(
        *[c for c in df.columns if c != html_col],
        F.posexplode(nonempty).alias("block_idx", "_b"),
    )
    is_content = (F.col("_b.word_count") >= F.lit(min_words)) & (
        F.col("_b.anchor_len") * F.lit(den) <= F.col("_b.text_len") * F.lit(num)
    )
    return out.select(
        *[c for c in out.columns if c != "_b"],
        F.col("_b.text").alias("text"),
        F.col("_b.text_len").alias("text_len"),
        F.col("_b.word_count").alias("word_count"),
        F.col("_b.anchor_len").alias("anchor_len"),
        is_content.alias("is_content"),
    )


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    *,
    min_words: int = 5,
    max_link_den: tuple[int, int] = (1, 3),
) -> DataFrame:
    """Page-level extraction: one row per input row, boilerplate removed.

    Keeps every non-HTML column, adds ``n_blocks`` / ``n_content`` counts,
    ``main_text`` (content blocks joined with ``\\n`` in document order)
    and ``main_len``.  Two narrow projections — no explode, no shuffle:
    the block array never leaves the expression tree, is classified ONCE
    (let-bound — see :func:`_let`), and the output columns unpack a
    single struct (the intermediate projection is not collapsed because
    the struct is referenced more than once).
    """
    num, den = max_link_den
    feats = F.transform(
        F.split(F.col(html_col), BLOCK_SPLIT_PATTERN),
        lambda b: block_features(b),
    )

    def page_struct(ne: Column) -> Column:
        content = F.filter(
            ne,
            lambda s: (s["word_count"] >= F.lit(min_words))
            & (s["anchor_len"] * F.lit(den) <= s["text_len"] * F.lit(num)),
        )
        return _let(
            content,
            lambda c: F.struct(
                F.size(ne).alias("n_blocks"),
                F.size(c).alias("n_content"),
                F.array_join(
                    F.transform(c, lambda s: s["text"]), "\n"
                ).alias("main_text"),
            ),
        )

    page = _let(
        F.filter(feats, lambda s: s["text_len"] > 0), page_struct
    )
    staged = df.select(
        *[c for c in df.columns if c != html_col], page.alias("_mc")
    )
    return staged.select(
        *[c for c in staged.columns if c != "_mc"],
        F.col("_mc.n_blocks").alias("n_blocks"),
        F.col("_mc.n_content").alias("n_content"),
        F.col("_mc.main_text").alias("main_text"),
        F.length("_mc.main_text").alias("main_len"),
    )
