"""TF-IDF salient-term extraction over the documents table.

The keyword/topic primitive a training-data pipeline runs right after
language ID and quality gating: per document, the k terms with the
highest tf·idf weight (corpus-level salience), used for topic bucketing,
domain mixing diagnostics, and cheap retrieval keys.

Spark shape (all JVM, no Python in the plan):

  tokenize   lower → regexp split on [^a-z0-9]+ → explode   (narrow)
  tf         groupBy (doc_id, term) count          (shuffle 1, partial agg)
  df         groupBy term count over the tf table  (shuffle 2, partial agg —
             counts DOCS per term since tf is already (doc,term)-distinct)
  join       tf ⋈ df on term                       (shuffle join; both sides
             already aggregated, so the join input is bounded by the
             vocabulary × corpus term incidence, never raw token volume)
  top-k      per-doc window rank on score desc     (shuffle 3 on doc_id)

Scoring uses the LINEAR idf variant, score = tf · N / df, computed as
cast(tf, double) · N / df: every step is a single correctly-rounded IEEE
operation, so Spark and any ANSI engine produce bit-identical doubles —
which makes per-doc ranking engine-portable (the log-idf variant's
`ln` is not guaranteed correctly rounded across libms, so two engines
can disagree on near-tie ranks). Ties break on the term string.

At 100 TB the heavy stage is tokenize+tf; it is a single map-side-
combinable aggregation keyed by (doc_id, term) — no skew (doc_id is in
the key), no all-pairs anything. The df table is vocabulary-sized; if a
dimension-style broadcast is wanted, cap the vocabulary first — here it
stays a shuffle join, which AQE converts to broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) token incidence with per-doc term frequency."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per document by tf · N/df (linear idf), ties on term.

    Returns (id_col, term, tf, df, rk) — integer outputs only; the float
    score orders the window but never leaves the plan."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = doc_terms(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # scalar N via a 1-row broadcast cross join — no driver round-trip,
    # and the plan stays one job
    n_docs = docs.select(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            F.col("tf").cast("double") * F.col("_n")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "rk")
    )
