"""Distributed BPE tokenizer training — byte-pair-encoding merge learning
as relational algebra over a word-frequency dim.

The canonical subword vocabulary for LLM training data (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
is learned by repeatedly merging the most frequent adjacent symbol pair.
The naive formulation re-scans the corpus every merge round; at 100 TB
that is num_merges full passes. The scale-correct shape — and the one
implemented here — exploits that BPE statistics are a pure function of
the WORD-FREQUENCY TABLE:

  pass 1 (the only corpus scan): explode normalized words → groupBy word
          count — the shuffle carries (word, int64) partials after
          map-side combine, never document text;
  per merge round (word dim only, corpus never touched again):
          adjacent-pair explode over each word's symbol array weighted by
          word freq → groupBy(left, right) sum → 1-row argmax collect
          (count desc, then lexicographic (left, right) — deterministic
          under any partitioning) → rewrite the space-joined symbol string
          with ONE compiled JVM regex per word (leftmost non-overlapping
          merge; zero Python; a no-match is an identity, so untouched
          words cost a single scan);
  encode: training's final symbol arrays ARE the encoded forms of every
          corpus word (applying the merge list in rank order to a training
          word reproduces its final array), so per-document token counts
          are a hash join of exploded doc words against the encoded dim —
          (word, int) keys shuffle, text does not.

At web scale the word dim is zipf-bounded (~10^8-9 distinct words for a
100 TB corpus — a partition-joinable dim), each merge round is one
edge-sized shuffle of (pair, int64) partials, and the per-round driver
collect is exactly one row. Lineage is kept flat with an eager
``localCheckpoint`` per round (same rationale as operators/components.py:
the argmax forces the plan anyway; without the barrier round N replans
all N-1 predecessors).

Determinism: merges depend only on exact integer counts and a total
tiebreak order, so results are invariant under partitioning — pinned by
tests/test_bpe.py and the pure-Python replica oracle
(tools/gen_expected.bpe_expected).

Reference basis: the reference crawler stores raw text and has no
tokenizer stage (/root/reference/article_spider.py saves responses
verbatim); vocabulary learning is what the fetched corpus feeds next in
a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

END = "</w>"  # Sennrich end-of-word marker: merges cannot cross words


def word_freq_dim(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus pass.

    Normalization matches the dedup family (functions/text.normalize_text)
    so the same word dim serves fingerprinting and BPE."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    return (
        docs.select(F.explode(words).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(sym_str, left: str, right: str):
    """Replace leftmost non-overlapping (left, right) adjacencies in the
    space-joined symbol string with the concatenated token — ONE compiled
    JVM regex per word instead of an interpreted per-symbol aggregate fold
    (round-6 optimization; the fold evaluated ~5 branch expressions per
    symbol per round, interpreted).

    Java's replaceAll scans left to right and resumes after each match,
    which is exactly the classic non-overlapping merge: ``a a a`` against
    pair (a, a) matches positions (0, 1), resumes at symbol 2, and leaves
    it unmerged. The zero-width lookarounds pin symbol boundaries without
    consuming the neighboring separator, so a chain like ``a b a b``
    merges both occurrences in one pass. \\Q..\\E quotes the pair text
    (symbols are normalized word characters plus the ``</w>`` marker —
    no ``\\E`` or replacement metacharacters can occur)."""
    pattern = "(?<=^| )\\Q" + left + " " + right + "\\E(?=$| )"
    return F.regexp_replace(sym_str, pattern, left + right)


def _adjacent_pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt) — every adjacent symbol position weighted by word
    freq (overlapping positions each count, matching the classic counter).
    ``words`` carries the space-joined ``sym_str``; the split array exists
    only inside this per-round counting expression."""
    symbols = F.split("sym_str", " ")
    n = F.greatest(F.size(symbols) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(symbols, 1, n),
        F.slice(symbols, F.lit(2), n),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 24,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges over ``docs``.

    Returns ``(merges, encoded_words)``:
      merges         (rank int, left, right, token) — the vocabulary, in
                     learned order;
      encoded_words  (word, freq, symbols array<string>) — every corpus
                     word in its final subword form (= BPE-encode of the
                     training corpus), ready for the token-count join.

    Stops early if no adjacent pair remains (fully merged corpus)."""
    spark = docs.sparkSession
    words = (
        word_freq_dim(docs, text_col)
        .withColumn(
            "sym_str",
            # the symbol sequence as a space-joined string: characters plus
            # the end marker. regexp_replace(word, '(.)', '$1 ') inserts the
            # separator after every character in one JVM pass (codepoint-
            # safe for the normalized \w corpus); the merge rewrite and the
            # pair counter both work off this representation.
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", "$1 "), F.lit(END)
            ),
        )
        # lazy: the round's argmax collect is the next action and
        # materializes the checkpoint inside its own job — eager would add
        # a second job per round for nothing (A/B at sf0.1: 10.4 s vs
        # 14.1 s for 24 rounds; the loop is round-latency-bound, not
        # compute-bound, at test scale)
        .localCheckpoint(eager=False)
    )
    learned: list[tuple[int, str, str, str]] = []
    for rank in range(num_merges):
        top = (
            _adjacent_pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        learned.append((rank, left, right, left + right))
        # lazy barrier per round: flat lineage (components.py rationale),
        # materialized by the next round's argmax collect. A word without
        # the pair is a regex no-match — identity, no has_pair gate needed.
        words = words.withColumn(
            "sym_str", _merge_pair_expr(F.col("sym_str"), left, right)
        ).localCheckpoint(eager=False)
    merges = spark.createDataFrame(
        learned, "rank INT, left STRING, right STRING, token STRING"
    )
    encoded = words.select(
        "word", "freq", F.split("sym_str", " ").alias("symbols")
    )
    return merges, encoded


def token_counts(
    docs: DataFrame,
    encoded_words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_tokens) per document under the learned vocabulary.

    One corpus scan exploding normalized words, aggregated to per-doc word
    multiplicities BEFORE the dim join (the join input carries (doc, word,
    int), one row per distinct word per doc), then a hash join against the
    encoded dim keyed on word. Documents whose normalized text is empty
    still appear, with zero counts."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    doc_words = (
        docs.select(F.col(id_col), F.explode(words).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dim = encoded_words.select(
        "word", F.size("symbols").alias("w_tokens")
    )
    counted = (
        doc_words.join(dim, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("w_tokens")).alias("n_tokens"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(counted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
