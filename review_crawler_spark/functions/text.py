"""Text-analysis column functions for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen'd): language ID heuristic,
quality scoring, token counting, fingerprinting. These extend the reference's
word-count analytics (/root/reference/rarticle.py:1340-1355:
``word_count = len(body.split(' '))``) to the operations a 100 TB corpus
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Top English stopwords for the n-gram/stopword language heuristic.
EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "as", "was", "with", "be", "by", "on", "not", "he", "this", "are",
]


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-ish token count: words + digits + punctuation runs.

    A cheap stand-in for BPE tokenizer counts (≈ tokens = matches of
    word-piece regex), fully JVM-side via regexp_count.
    """
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^\w\s]"))


def digit_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[0-9]"))


def stopword_count(text: Column) -> Column:
    """Count of English stopword occurrences (word-boundary matches)."""
    pattern = r"(?i)\b(" + "|".join(EN_STOPWORDS) + r")\b"
    return F.regexp_count(text, F.lit(pattern))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1].

    Combines length, punctuation ratio and stopword ratio — the classic
    C4/Gopher-style cheap filters — as one JVM expression.
    """
    n_tok = token_count(text)
    n_char = F.greatest(char_count(text), F.lit(1))
    punct_ratio = punct_count(text) / n_char
    stop_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.greatest(
            F.least(
                len_score * 0.4
                + F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.4
                + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2,
                F.lit(1.0),
            ),
            F.lit(0.0),
        ),
        4,
    )


def lang_guess(text: Column) -> Column:
    """Stopword-density language ID: 'en' vs 'other'.

    A document whose English-stopword share of tokens exceeds 12% is called
    English. Deterministic, JVM-side; a production system would swap in a
    fastText-style model via a pandas UDF.
    """
    n_tok = F.greatest(token_count(text), F.lit(1))
    return F.when(stopword_count(text) / n_tok > 0.12, F.lit("en")).otherwise(
        F.lit("other")
    )


def normalize_text(text: Column) -> Column:
    """Lowercase, strip punctuation, collapse whitespace — dedup pre-pass."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " ")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so a DuckDB oracle can reproduce it bit-for-bit.
    """
    return F.md5(F.encode(normalize_text(text), "UTF-8"))


def exploded_word_shingles(df, id_col: str, text_col: str, k: int = 3,
                           with_pos: bool = False):
    """(id, _s[, _pos]) — one row per k-word shingle, codegen friendly.

    Same shingle strings as :func:`word_shingles`, but built by exploding an
    ``arrays_zip`` of k shifted word slices and gluing with ``concat_ws`` —
    scalar expressions only, no per-element lambda interpretation (the
    transform+slice+array_join path evaluates an interpreted lambda per
    shingle: ~10× slower on the sf0.1 corpus). Docs with < k words emit no
    rows. Use this for hot per-shingle pipelines (minhash); keep
    :func:`word_shingles` where a per-doc array is genuinely needed.
    """
    from pyspark.sql import functions as F  # local import keeps module header light

    words = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col), words.alias("_w")).withColumn(
        "_n", F.size("_w")
    )
    slices = [
        F.slice("_w", j + 1, F.col("_n") - (k - 1)).alias(f"_a{j}") for j in range(k)
    ]
    filtered = base.filter(F.col("_n") >= k)
    if with_pos:
        return filtered.select(
            F.col(id_col), F.posexplode(F.arrays_zip(*slices)).alias("_pos", "_z")
        ).select(
            F.col(id_col),
            (F.col("_pos") + 1).alias("_pos"),  # 1-based document order
            F.concat_ws(" ", *[F.col(f"_z._a{j}") for j in range(k)]).alias("_s"),
        )
    return filtered.select(
        F.col(id_col), F.explode(F.arrays_zip(*slices)).alias("_z")
    ).select(
        F.col(id_col),
        F.concat_ws(" ", *[F.col(f"_z._a{j}") for j in range(k)]).alias("_s"),
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (document-order), built with JVM array ops.

    transform over a sequence of start indices + slice + array_join — no
    Python. Empty/short docs yield an empty array.
    """
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.expr("array()")
    )
    return F.transform(
        starts, lambda i: F.array_join(F.slice(words, i, k), " ")
    )


def repetition_stats(docs, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Gopher-style repetition quality counters per document.

    The filters Rae et al. (Gopher, arXiv 2112.11446 §A1.1) and
    RefinedWeb apply before training: documents dominated by a repeated
    token, a repeated n-gram, or duplicated spans are boilerplate/spam
    and get dropped. Emitted as EXACT integer counters (numerators +
    denominators, not floats) so thresholds stay a consumer choice and
    oracles hash bit-exactly:

      n_tokens          total whitespace tokens
      top_unigram       occurrences of the most frequent token
      top_bigram        occurrences of the most frequent word 2-gram
      dup_trigram_pos   trigram positions whose trigram occurs >1 time
      n_trigrams        total trigram positions

    Scale shape: one explode per gram order, partial-aggregated groupBy
    on (doc_id, gram) — shuffles carry (id, gram, count) rows only, never
    the document text; the three gram orders then join back on doc_id
    (the grouped frames are doc-count-sized). No Python in the hot path —
    split/slice/concat_ws are all JVM expressions.
    """
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )

    def grams(k: int):
        # contiguous k-grams via sequence+slice (array ops, JVM-side);
        # guard short docs — Spark's sequence(1, 0) DESCENDS, not empties
        n = F.size("_toks")
        starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
            F.expr("array()")
        )
        g = F.transform(
            starts, lambda i: F.array_join(F.slice("_toks", i, k), " ")
        )
        return (
            toks.select(F.col(id_col), F.explode(g).alias("_g"))
            .groupBy(id_col, "_g")
            .agg(F.count("*").alias("_c"))
        )

    uni = grams(1).groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"), F.max("_c").alias("top_unigram")
    )
    big = grams(2).groupBy(id_col).agg(F.max("_c").alias("top_bigram"))
    tri = grams(3).groupBy(id_col).agg(
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias(
            "dup_trigram_pos"
        ),
        F.sum("_c").alias("n_trigrams"),
    )
    return (
        uni.join(big, id_col, "left")
        .join(tri, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long"),
            F.col("top_unigram").cast("long"),
            F.coalesce("top_bigram", F.lit(0)).cast("long").alias("top_bigram"),
            F.coalesce("dup_trigram_pos", F.lit(0)).cast("long").alias(
                "dup_trigram_pos"
            ),
            F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
        )
    )
