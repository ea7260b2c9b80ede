"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023, arXiv:2302.03169).

The fourth pillar of a training-data pipeline after dedup, langid, and
quality gating: given a small TARGET corpus (the distribution you want —
e.g. curated encyclopedic text) and a huge RAW corpus (the crawl), score
every raw document by how target-like it is and keep the top slice. DSIR
does this with hashed n-gram features: estimate a bag-of-ngrams
multinomial over B hash buckets for each corpus, then weight a document
by its log likelihood ratio

    log w(x) = sum over ngram occurrences g of
               [ log p_target(bucket(g)) - log p_raw(bucket(g)) ]

and select the highest-weight documents. (The paper resamples with
Gumbel noise; the deterministic top-k by weight is the same estimator
with temperature → 0 and is reproducible across reruns, which a corpus
build needs — the tiebreak is (weight, doc_id).)

Engine shape at 100 TB:
  1. doc → bigrams → hashed bucket: narrow JVM projection (split /
     zip_with / md5-prefix mod B), zero Python;
  2. the two bucket histograms aggregate (bucket, count) partials with
     map-side combine — B rows each (B ≈ 10^4), driver-free via a 1-row
     total cross-joined broadcast (the graphrank dangling-mass shape);
  3. the per-bucket score dim (B rows) is BROADCAST into the occurrence
     stream — the corpus never shuffles to be scored;
  4. per-doc weight = groupBy(doc_id) SUM of integers; top-k via
     TakeOrderedAndProject (never a global sort).

Determinism across engines: the bucket hash is the first 8 hex chars of
md5(w1 ⊔ w2 ⊔ salt) mod B (md5 is md5 in every engine — the same trick
operators/sampling.py uses), and the per-bucket log-ratio is quantized
ONCE PER BUCKET to integer tenth-milli-nats (round(· × 1e4), the
operators/lm_quality.py convention), so per-document weights are sums of
integers — order-independent under any partitioning, bit-equal in the
DuckDB oracle twin.

Laplace smoothing (+1 per bucket) keeps buckets unseen in the target
finite; they score negative and drag a document down, which is the
desired behavior for out-of-domain text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

#: number of hash buckets for the n-gram feature space
N_BUCKETS = 4096


def hashed_bigram_occurrences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket) — one row per bigram OCCURRENCE (not type): DSIR's
    feature vector is occurrence counts, so a repeated phrase counts every
    time. bucket = int(md5(w1||' '||w2||salt)[:8], 16) % n_buckets.

    Narrow end-to-end: split → zip_with pairs → explode → md5 prefix →
    conv(16, 10) → mod. Documents with < 2 tokens contribute nothing.

    ``keep_cols``: extra columns carried through unchanged (the shared-
    corpus path tags rows with the target flag)."""
    w = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g = F.col("g")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(g, F.lit(salt))), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )
    return (
        docs.select(F.col(id_col).alias("id"), *keep_cols, grams.alias("gs"))
        .filter(F.size("gs") >= 1)
        .select("id", *keep_cols, F.explode("gs").alias("g"))
        .select("id", *keep_cols, bucket.alias("bucket"))
    )


def _bucket_histogram(occ: DataFrame) -> DataFrame:
    """(bucket, c, total) — occurrence count per bucket plus the corpus
    total carried on every row (1-row aggregate cross-joined broadcast, so
    the scalar never touches the driver)."""
    counts = occ.groupBy("bucket").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    return counts.crossJoin(F.broadcast(total))


def dsir_bucket_scores(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "",
) -> DataFrame:
    """The score dim: (bucket, score_e4) for every bucket seen in EITHER
    corpus, where score_e4 = round((ln p_target - ln p_raw) × 1e4) with
    add-1 smoothing: p(b) = (c_b + 1) / (total + n_buckets).

    Quantized per bucket TYPE, so downstream per-document weights are
    integer sums. B rows — broadcastable at any corpus size."""
    t = _bucket_histogram(
        hashed_bigram_occurrences(
            target_docs, id_col, text_col, n_buckets, salt
        )
    ).withColumnsRenamed({"c": "tc", "total": "tt"})
    r = _bucket_histogram(
        hashed_bigram_occurrences(raw_docs, id_col, text_col, n_buckets, salt)
    ).withColumnsRenamed({"c": "rc", "total": "rt"})
    return _scores_from_histograms(t, r, n_buckets)


def _scores_from_histograms(
    t: DataFrame, r: DataFrame, n_buckets: int
) -> DataFrame:
    """(bucket, score_e4) from the two renamed histograms. Outer join
    keeps buckets seen in only one corpus; missing counts are 0 and the
    missing TOTAL is recovered from any row of the other side (1-row agg
    per side, cross-joined broadcast — no driver scalar)."""
    tt = t.agg(F.max("tt").alias("tt_all"))
    rt = r.agg(F.max("rt").alias("rt_all"))
    joined = (
        t.select("bucket", "tc")
        .join(r.select("bucket", "rc"), "bucket", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "bucket",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
            F.coalesce(F.col("tt_all"), F.lit(0)).alias("tt"),
            F.coalesce(F.col("rt_all"), F.lit(0)).alias("rt"),
        )
    )
    score = (
        F.log((F.col("tc") + 1) / (F.col("tt") + n_buckets))
        - F.log((F.col("rc") + 1) / (F.col("rt") + n_buckets))
    ) * 1e4
    return joined.select(
        "bucket", F.round(score).cast("long").alias("score_e4")
    )


def dsir_importance_weights(
    raw_docs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "",
) -> DataFrame:
    """(id, n_grams, weight_e4) per raw document with >= 1 bigram.

    The B-row score dim broadcasts into the occurrence stream (the corpus
    never shuffles to be scored); the only wide op is the per-doc integer
    sum, which shuffles (id, long) partials."""
    occ = hashed_bigram_occurrences(
        raw_docs, id_col, text_col, n_buckets, salt
    )
    return (
        occ.join(F.broadcast(scores), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("score_e4").alias("weight_e4"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            "weight_e4",
        )
    )


def dsir_select_topk_within(
    docs: DataFrame,
    target_cond,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "",
) -> DataFrame:
    """:func:`dsir_select_topk` for the common deployment where the target
    corpus is a FILTER of the raw corpus (``target_cond`` — e.g. the
    language-id gate). One corpus explode serves both histograms AND the
    scoring join (round-6: the generic two-corpus path tokenized and
    hashed the target subset a second time); per-bucket counts, scores,
    and weights are identical to the generic path by construction."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    flagged = docs.withColumn("_is_target", target_cond)
    occ = hashed_bigram_occurrences(
        flagged, id_col, text_col, n_buckets, salt, keep_cols=("_is_target",)
    ).localCheckpoint(eager=True)
    t = _bucket_histogram(
        occ.filter(F.col("_is_target")).select("id", "bucket")
    ).withColumnsRenamed({"c": "tc", "total": "tt"})
    r = _bucket_histogram(occ.select("id", "bucket")).withColumnsRenamed(
        {"c": "rc", "total": "rt"}
    )
    scores = _scores_from_histograms(t, r, n_buckets)
    w = (
        occ.join(F.broadcast(scores), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("score_e4").alias("weight_e4"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            "weight_e4",
        )
    )
    return w.orderBy(F.col("weight_e4").desc(), F.col(id_col)).limit(k)


def dsir_select_topk(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "",
) -> DataFrame:
    """The k most target-like raw documents by hashed-bigram importance
    weight, deterministic tiebreak (weight desc, id asc). orderBy +
    limit plans as TakeOrderedAndProject — per-partition top-k then a
    k-row merge, never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the raw-corpus occurrence stream feeds BOTH the raw histogram and
    # the scoring join — pin it once (eager localCheckpoint, the minhash
    # bucket_groups convention) so the explode+hash subtree runs a single
    # time instead of once per consumer
    occ_raw = hashed_bigram_occurrences(
        raw_docs, id_col, text_col, n_buckets, salt
    ).localCheckpoint(eager=True)
    t = _bucket_histogram(
        hashed_bigram_occurrences(
            target_docs, id_col, text_col, n_buckets, salt
        )
    ).withColumnsRenamed({"c": "tc", "total": "tt"})
    r = _bucket_histogram(occ_raw).withColumnsRenamed(
        {"c": "rc", "total": "rt"}
    )
    scores = _scores_from_histograms(t, r, n_buckets)
    w = (
        occ_raw.join(F.broadcast(scores), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("score_e4").alias("weight_e4"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            "weight_e4",
        )
    )
    return w.orderBy(F.col("weight_e4").desc(), F.col(id_col)).limit(k)
