"""Domain mixing by repeat-and-sample upsampling.

Pretraining mixes sources at target weights by REPEATING high-value /
low-volume domains some (possibly fractional) number of epochs and
downsampling the rest — e.g. "wiki ×3.2, crawl ×0.6". The relational
form of "×f" for one row is:

    floor(f) full copies                          (copy_id 0..floor(f)-1)
  + 1 more copy kept iff hash(key) < frac(f)     (copy_id floor(f))

so membership of every copy is a pure function of (key, salt, f) — the
same reproducibility contract as operators/sampling.py: re-runs,
retries, and cluster resizes cannot change the mixed corpus. A factor
below 1 degenerates to a plain Bernoulli downsample; a factor of 0
drops the stratum.

Scale shape: the expansion is `explode(sequence(0, n_copies-1))` — a
narrow generate over the scan, no shuffle, no state; the fractional
gate is the md5-threshold string comparison (JVM codegen). Expected
output size is Σ_s f_s·|s| by construction, and the hash gate's
deviation is binomial, not partitioning-dependent.

The factors dict is part of the JOB SPEC (like sampling rates), not
data — computing the factors from corpus statistics (DoReMi etc.) is an
upstream decision; this operator applies a given mix exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import rate_threshold, sample_hash


def upsample_mix(
    df: DataFrame,
    strata_col: str,
    factors: dict[str, float],
    key_col: str,
    default_factor: float = 1.0,
    salt: str = "",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Repeat-and-sample each stratum by its mix factor.

    Returns the input rows expanded with ``copy_col`` (int, 0-based):
    a stratum with factor f yields floor(f) deterministic full copies
    plus one fractional copy gated by the md5 threshold. Strata not in
    ``factors`` use ``default_factor``. Factors must be finite and
    >= 0."""
    for s, f in factors.items():
        if not (math.isfinite(f) and f >= 0):
            raise ValueError(f"factor for {s!r} must be finite >= 0, got {f}")
    if not (math.isfinite(default_factor) and default_factor >= 0):
        raise ValueError(f"default_factor must be finite >= 0")

    def split(f: float) -> tuple[int, str]:
        whole = int(f)
        return whole, rate_threshold(f - whole)

    d_whole, d_thresh = split(default_factor)
    whole = F.lit(d_whole)
    thresh = F.lit(d_thresh)
    for value, f in sorted(factors.items()):
        w, t = split(f)
        cond = F.col(strata_col) == value
        whole = F.when(cond, F.lit(w)).otherwise(whole)
        thresh = F.when(cond, F.lit(t)).otherwise(thresh)
    # n_copies = whole copies + the fractional one if the hash clears
    n = whole + F.when(
        sample_hash(F.col(key_col), salt) < thresh, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )
