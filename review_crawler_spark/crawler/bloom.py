"""Partitioned bloom filter over url_hash — the URL-seen prefilter.

Replaces Scrapy's in-memory RFPDupeFilter fingerprint set (default-on in the
reference; nothing in /root/reference/crawling/crawling/settings.py disables
it) with a design that survives 10^10 keys:

- the key space is sharded by ``pmod(url_hash, P)`` into P independent bloom
  shards (numpy bit arrays);
- shards are BUILT distributively: groupBy(shard).applyInPandas emits one
  ``(shard_id, bits)`` row per shard — no driver-side key materialization;
- shards are PROBED distributively: candidates.cogroup(shards).applyInPandas
  — each task sees only its shard's bits and its shard's candidates, so no
  12 GB broadcast at 10^10 scale (SURVEY.md §7 "hard parts");
- the bloom is only a PREFILTER: bloom-negative rows are definitely new and
  skip the expensive anti-join; bloom-positive rows are confirmed against
  the exact Iceberg/parquet ``url_seen`` table. Zero false negatives by
  construction — correctness never depends on the bloom.

Hashing: k probe positions derived from the single 64-bit xxhash64 via the
standard Kirsch-Mitzenmacher double hashing h1 + i*h2 (public technique),
vectorized in numpy over the whole Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_BITS_DEFAULT = 1 << 20  # 128 KiB per shard; tune m/n for target FPP
NUM_HASHES = 5


def _positions(hashes: np.ndarray, m: int) -> np.ndarray:
    """(n, NUM_HASHES) probe positions via double hashing, vectorized."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
    i = np.arange(NUM_HASHES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Row-wise AND over NUM_HASHES probes → membership-maybe mask."""
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return got.all(axis=1)


def shard_of(url_hash, num_shards: int):
    return F.pmod(url_hash, F.lit(num_shards)).cast("int")


def build_shards(
    url_seen: DataFrame, num_shards: int, shard_bits: int = SHARD_BITS_DEFAULT
) -> DataFrame:
    """url_seen(url_hash, ...) → shards(shard_id int, bits binary).

    One shuffle on shard_id; each task folds its hashes into a numpy bitset.
    Shards with no seen keys emit no row — the cogroup probe treats a
    missing shard as an empty bloom (maybe_seen=False), which is exact.

    NB: the url_hash column must stay int64 end-to-end; never union it with
    nulls (Arrow→pandas would upcast to float64 and corrupt hashes > 2^53).
    """
    hashed = url_seen.select(
        F.col("url_hash"), shard_of(F.col("url_hash"), num_shards).alias("shard_id")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(shard_bits >> 3, dtype=np.uint8)
        if len(pdf):
            _set_bits(bits, _positions(pdf["url_hash"].to_numpy(np.int64), shard_bits))
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])], "bits": [bits.tobytes()]}
        )

    return hashed.groupBy("shard_id").applyInPandas(
        fold, schema="shard_id int, bits binary"
    )


def update_shards(
    shards: DataFrame,
    delta: DataFrame,
    num_shards: int,
    shard_bits: int = SHARD_BITS_DEFAULT,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Incrementally OR a wave's new hashes into the existing shards.

    Cost is O(delta + P·bits) per wave — never a rebuild over the full
    url_seen history (at 10^10 keys a rebuild per wave would dwarf the
    crawl itself). Cogrouped by shard id; shards untouched by the delta
    pass through unchanged.
    """
    hashed = delta.select(
        F.col(hash_col), shard_of(F.col(hash_col), num_shards).alias("shard_id")
    )

    def merge(key, bits_rows: pd.DataFrame, hash_rows: pd.DataFrame) -> pd.DataFrame:
        if len(bits_rows):
            bits = np.frombuffer(bits_rows["bits"].iloc[0], dtype=np.uint8).copy()
            sid = int(bits_rows["shard_id"].iloc[0])
        else:
            bits = np.zeros(shard_bits >> 3, dtype=np.uint8)
            sid = int(hash_rows["shard_id"].iloc[0])
        if len(hash_rows):
            _set_bits(
                bits, _positions(hash_rows[hash_col].to_numpy(np.int64), shard_bits)
            )
        return pd.DataFrame({"shard_id": [sid], "bits": [bits.tobytes()]})

    return (
        shards.groupBy("shard_id")
        .cogroup(hashed.groupBy("shard_id"))
        .applyInPandas(merge, schema="shard_id int, bits binary")
    )


def dedup_and_probe(
    candidates: DataFrame,
    shards: DataFrame,
    num_shards: int,
    shard_bits: int = SHARD_BITS_DEFAULT,
    hash_col: str = "url_hash",
    priority_col: str = "priority",
    seq_col: str = "seq",
) -> DataFrame:
    """Fused in-batch dedup + bloom probe in ONE shuffle.

    Because the shard id is a pure function of the hash, per-hash dedup is
    shard-local: the same cogrouped task that probes the bloom bits first
    drops duplicate hashes (keeping the (priority DESC, seq ASC) winner —
    the admission contract). This replaces a groupBy(min_by) shuffle plus a
    probe shuffle with a single exchange of the candidate set — at 10^10
    rows that is the difference between 2× and 1× frontier-sized shuffles
    per wave.

    Arrow-native cogroup (applyInArrow): the candidate URL strings never
    materialize as Python objects — the winner-per-hash selection is a
    numpy lexsort + unique over the hash/priority/seq columns and the
    surviving rows are re-sliced from the Arrow buffers with ``take``.
    """
    import pyarrow as pa

    left = candidates.withColumn("shard_id", shard_of(F.col(hash_col), num_shards))

    def do(key, cand: pa.Table, bits_rows: pa.Table) -> pa.Table:
        cand = cand.drop_columns(["shard_id"])
        if cand.num_rows == 0:
            return cand.append_column(
                "maybe_seen", pa.array([], type=pa.bool_())
            )
        h = cand[hash_col].to_numpy()
        pri = cand[priority_col].to_numpy()
        seq = cand[seq_col].to_numpy()
        # winner order: priority DESC, seq ASC (last key = primary)
        order = np.lexsort((seq, -pri))
        # first occurrence of each hash in winner order = admission winner
        _, first = np.unique(h[order], return_index=True)
        keep = order[np.sort(first)]
        out = cand.take(pa.array(keep))
        if bits_rows.num_rows == 0:
            maybe = np.zeros(len(keep), dtype=bool)
        else:
            bits = np.frombuffer(bits_rows["bits"][0].as_py(), dtype=np.uint8)
            maybe = _test_bits(bits, _positions(h[keep], shard_bits))
        return out.append_column("maybe_seen", pa.array(maybe))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"
    return (
        left.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInArrow(do, schema=out_schema)
    )


def probe(
    candidates: DataFrame,
    shards: DataFrame,
    num_shards: int,
    shard_bits: int = SHARD_BITS_DEFAULT,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Append ``maybe_seen boolean`` to candidates via cogrouped shard probe.

    Both sides shuffle once on shard_id; the shard bitset never leaves its
    task. Result column is False ⇒ definitely unseen (bloom guarantee).
    """
    cols = candidates.columns

    left = candidates.withColumn("shard_id", shard_of(F.col(hash_col), num_shards))

    def do_probe(key, cand_it, shard_it) -> pd.DataFrame:
        cand = cand_it
        bits_rows = shard_it
        if len(cand) == 0:
            return cand.drop(columns=["shard_id"]).assign(
                maybe_seen=pd.Series([], dtype=bool)
            )
        if len(bits_rows) == 0:
            maybe = np.zeros(len(cand), dtype=bool)
        else:
            bits = np.frombuffer(bits_rows["bits"].iloc[0], dtype=np.uint8)
            pos = _positions(cand[hash_col].to_numpy(np.int64), shard_bits)
            maybe = _test_bits(bits, pos)
        out = cand.drop(columns=["shard_id"]).copy()
        out["maybe_seen"] = maybe
        return out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    return (
        left.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(do_probe, schema=out_schema)
    )
