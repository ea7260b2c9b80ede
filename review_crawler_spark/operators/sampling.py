"""Deterministic, reproducible sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning: re-run the job with a
different partition count and a "seeded" sample changes membership — a
training-data pipeline needs the SAME document selected no matter how the
cluster splits the scan (re-runs, retries, resizes must not change the
corpus). Both operators here key selection off a content hash
(md5(key || salt)), so membership is a pure function of the row:

- ``stratified_sample``: per-stratum Bernoulli by hash-threshold — rate
  r keeps rows whose first 15 hex digits of md5 compare below the hex
  threshold of floor(r·16^15). Pure filter: no shuffle, no state, scales
  to any size, and the SQL twin is the same string comparison.
- ``sample_exact_k``: exactly k rows per stratum, chosen by hash rank —
  a window top-k (one shuffle on the stratum key; salting is the
  caller's job if a stratum is the whole corpus).

Hash-threshold sampling is the standard reproducible-split trick
(e.g. train/validation splits by md5 in data-pipeline folklore); the
threshold form keeps everything in lexicographic-string land so Spark
and any ANSI engine agree bit-for-bit with no integer parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 15  # 60 bits of the md5 — plenty below any sane precision


def rate_threshold(rate: float) -> str:
    """rate in [0, 1] → zero-padded 15-hex-digit lexicographic cutoff.

    rate 1.0 returns "g": every hex string sorts below it ('g' > 'f'),
    so the full stratum is kept — the 16-digit "1000…0" form would sort
    BELOW most 15-char hashes and silently drop ~94% of rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * (16 ** _HEX_DIGITS))
    if n >= 16 ** _HEX_DIGITS:
        return "g"
    return format(n, "x").zfill(_HEX_DIGITS)


def sample_hash(key, salt: str = ""):
    """The selection hash: first 15 hex chars of md5(key || salt).
    Changing ``salt`` draws an independent sample from the same corpus
    (disjoint-ish splits: compare against [lo, hi) threshold bands)."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1,
                       _HEX_DIGITS)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sample, reproducible across any partitioning.

    ``rates`` maps stratum value → keep rate; strata not listed use
    ``default_rate``. Pure narrow filter — the per-stratum threshold is a
    CASE expression, so the plan is scan → filter with full pushdown of
    any surrounding predicates."""
    cutoff = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(rate_threshold(rate))
        ).otherwise(cutoff)
    return df.filter(sample_hash(F.col(key_col), salt) < cutoff)


def sample_exact_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, by hash order.

    Deterministic: the "random" order is md5(key || salt), so re-runs and
    repartitions pick the same rows. One shuffle on the stratum key; the
    window ranks by (hash, key) — the key tiebreak makes even md5-prefix
    collisions deterministic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
