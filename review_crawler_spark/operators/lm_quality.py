"""Bigram language-model perplexity scoring — CCNet-style quality bucketing.

The third pillar of a CCNet-shaped training-data pipeline (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020): after dedup (operators/dedup.py) and language id
(functions/text.py::lang_id), documents are bucketed by language-model
perplexity — fluent text scores low, boilerplate/gibberish scores high.
CCNet uses a KenLM 5-gram; the distribution-shape is identical for any
n-gram LM, so this module implements an add-1-smoothed token BIGRAM model
whose training AND scoring are pure relational algebra (no UDF anywhere):

  train:  explode bigrams → groupBy(w1, w2) count  (map-side partial agg —
          the shuffle carries distinct-bigram partials, not token streams)
  score:  bigram stream ⋈ LM dim on (w1, w2) → per-doc sum
  P(w2|w1) = (c12 + 1) / (c1 + V)      (Laplace / add-1)

Determinism across engines (the DuckDB oracle twin): every per-bigram
negative-log-likelihood is computed ONCE PER BIGRAM TYPE inside the LM dim
and immediately quantized to integer tenth-milli-nats
(``round(nll * 1e4)`` as BIGINT) — per-document scores are then SUMS OF
INTEGERS, which are order-independent under any partitioning/merge order,
so Spark and DuckDB agree bit-for-bit however the shuffle lands. (A double
sum would be order-dependent; ln() itself could differ in the last ulp
between libms, but a flip through the 1e-4 quantization boundary needs
|frac| within ~1e-12 of 0.5 — measure-zero in practice and pinned by the
oracle gate.)

100 TB shape: the LM is a dim table bounded by distinct-bigram cardinality
(zipf-capped, ~10^8-10^9 at web scale — partition-joinable; broadcastable
after min-count pruning); the training shuffle is partial-aggregated; the
scoring join is stream ⋈ dim with AQE skew handling for stopword-bigram
keys; the per-doc agg shuffles (doc_id, integer partials) only.

Reference basis: the reference crawler has no quality scoring at all (it
keeps every fetched page — /root/reference/article_spider.py saves all
responses); perplexity bucketing is what a 100 TB corpus needs before
training on the fetched text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, normalized tokens.

    zip_with over two shifted slices stays whole-stage-codegen; documents
    with fewer than 2 tokens contribute nothing (they have no bigrams and
    are absent from the scored output, like the pair operators' singleton
    convention)."""
    w = F.split(normalize_text(F.col(text_col)), " ")
    pairs = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(F.col(id_col).alias("id"), pairs.alias("bg"))
        .filter(F.size("bg") >= 1)
        .select("id", F.explode("bg").alias("b"))
        .select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def train_bigram_lm(
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Add-1-smoothed bigram LM as a dim table: (w1, w2, nll_e4).

    nll_e4 = round(ln((c1 + V) / (c12 + 1)) * 1e4) — integer
    tenth-milli-nats of -ln P(w2|w1), quantized once per bigram TYPE so
    downstream per-document sums are integer (order-independent). V is the
    distinct-token vocabulary size of the training corpus (1-row aggregate,
    collected — the same justified-scalar shape as the components fixpoint
    signature)."""
    return _lm_from_bigrams(_doc_bigrams(train_docs, id_col, text_col))


def _lm_from_bigrams(bg: DataFrame) -> DataFrame:
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.round(
            (F.log(F.col("c1") + F.lit(int(vocab))) - F.log(F.col("c12") + 1))
            * 10000
        )
        .cast("long")
        .alias("nll_e4"),
    )


def lm_quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_bigrams, nll_e4, avg_nll, quality_bucket) per document
    with ≥1 bigram — lower avg_nll = more LM-fluent text.

    ``train_docs`` defaults to ``docs`` itself (self-scoring: every scored
    bigram exists in the LM, so the join is inner with full coverage — the
    CCNet deployment trains on a held-out slice instead and unseen bigrams
    back off; pass that slice here and unseen bigrams are simply absent
    from the sum, an optimistic backoff that keeps the pipeline
    UDF-free).

    quality_bucket = floor(avg nll in nats) — integer perplexity band
    (bucket b covers perplexity e^b..e^(b+1) per token); deterministic
    because it floors an exact IEEE division of two integers, identical in
    any engine."""
    if train_docs is None:
        # self-scoring: the bigram explode (the dominant subtree — tokenize
        # + normalize + explode of the full corpus) feeds THREE consumers
        # (vocab agg, count agg, scoring join). Materialize it once so the
        # plan recomputes none of them — same eager-checkpoint discipline
        # as the minhash bucket_groups (operators/dedup.py:193-208).
        bg = _doc_bigrams(docs, id_col, text_col).localCheckpoint(eager=True)
        lm = _lm_from_bigrams(bg)
    else:
        lm = train_bigram_lm(train_docs, id_col, text_col)
        bg = _doc_bigrams(docs, id_col, text_col)
    scored = bg.join(lm, ["w1", "w2"])
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("nll_e4").alias("nll_e4"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            "nll_e4",
            F.round(
                F.col("nll_e4") / 10000.0 / F.col("n_bigrams"), 6
            ).alias("avg_nll"),
            F.floor(F.col("nll_e4") / 10000.0 / F.col("n_bigrams"))
            .cast("int")
            .alias("quality_bucket"),
        )
    )
