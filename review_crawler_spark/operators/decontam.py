"""Train/eval decontamination: word n-gram overlap against a benchmark set.

The standard LLM-pipeline hygiene step (documented in GPT-3 §C / PaLM /
Llama dataset cards as "n-gram overlap decontamination"): a training
document is contaminated if it shares any word n-gram with an evaluation
benchmark. Relational shape, no UDFs:

    train docs --split/slide--> distinct (doc_id, gram_hash)
    bench docs --split/slide--> distinct (bench_id, gram_hash)  [broadcast]
    equi-join on gram_hash -> per-doc overlap counts

Scale: the gram explosion is linear in corpus tokens and never collected
NOR shuffled — the train side is deliberately NOT pre-distinct'd (the
final countDistinct dedups within-doc repeats), so the broadcast join
filters the explosion in place and the one shuffle carries only
CONTAMINATED (doc, gram) survivors, normally a vanishing fraction of the
corpus. The benchmark side (MBs of eval text vs TBs of train) is
distinct'd — a cheap shuffle that shrinks the broadcast. For a benchmark
too big to broadcast, pass ``broadcast_bench=False`` and the sides
shuffle-join on gram_hash (AQE handles skewed stop-gram buckets).

The sliding window is a SQL ``transform(sequence(...), slice(...))``
expression (JVM codegen; a sibling-lambda-free single HOF), hashed with
xxhash64 so the shuffled/broadcast payload is 8 bytes per gram, not the
gram text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hashes(
    df: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    out_id: str,
    dedup: bool,
) -> DataFrame:
    """(out_id, gram_hash) pairs: every word n-gram of text. ``dedup``
    shuffles — only worth it on the small (broadcast) side."""
    grams = (
        df.select(
            F.col(id_col).alias(out_id),
            F.split(F.col(text_col), " ").alias("w"),
        )
        .where(F.size("w") >= n)
        .select(
            out_id,
            F.expr(
                f"explode(transform(sequence(0, size(w) - {n}), "
                f"i -> xxhash64(array_join(slice(w, i + 1, {n}), ' '))))"
            ).alias("gram_hash"),
        )
    )
    return grams.distinct() if dedup else grams


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-training-doc contamination report vs a benchmark corpus.

    Returns (doc_id, n_overlapping_grams, n_bench_docs) for every training
    document sharing ≥1 word n-gram with any benchmark document; clean
    documents are absent (anti-join the result to keep them).
    """
    train_grams = _gram_hashes(docs, n, id_col, text_col, "doc_id", False)
    bench_grams = _gram_hashes(
        bench, n, id_col, text_col, "bench_doc_id", True
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        train_grams.join(bench_grams, "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_hash").alias("n_overlapping_grams"),
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
        )
    )
