"""Partitioned cuckoo filter over url_hash — the deletable URL-seen prefilter.

The north rule names "a partitioned bloom/cuckoo URL-seen filter"; this is
the cuckoo half (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014, public algorithm). Same
replacement target as bloom.py: Scrapy's in-memory RFPDupeFilter
(default-on in the reference — nothing in
/root/reference/crawling/crawling/settings.py disables it), re-expressed as
sharded state that survives 10^10 keys.

What the cuckoo variant buys over the bloom shards:

- **deletion** — a fingerprint can be removed, so recrawl/TTL expiry of
  url_seen entries (re-admit a URL after its freshness window) works
  without rebuilding the filter; a bloom can only grow;
- ~2 bytes/key at 16-bit fingerprints for FPP ≈ 2b/2^f ≈ 0.012% — better
  space·accuracy than the bloom shards at the same shard budget.

Sharding, build, probe, and the fused in-batch dedup+probe mirror
bloom.py's API exactly (same function names and signatures), so
CrawlEngine swaps between the two with a module reference — the admission
contract, exact-confirm join, and golden crawl order are filter-agnostic
(the filter is only ever a prefilter; bloom.py's zero-false-negative
argument applies unchanged: correctness never depends on it).

Table layout per shard: ``m`` buckets × ``SLOTS``(4) slots of 16-bit
fingerprints (uint16 little-endian; 0 = empty, fingerprints are mapped to
never be 0). ``m`` is a power of two so the partner-bucket XOR stays in
range. Candidate buckets: ``i1 = h mod m``, ``i2 = i1 XOR mix(fp) mod m``
— the standard partial-key cuckoo hashing, so a stored fingerprint's
alternate bucket is computable without the original key (what makes both
eviction and deletion possible).

Inserts are vectorized in waves, not per-key: wave 1 places every
fingerprint that fits in a free slot of its i1 bucket (rank-vs-free-slot
matching over the whole batch at once), wave 2 the remainder into i2;
only the residue — empty at the engine's sizing, a few per million near
full load — walks the classic sequential eviction loop. Probes and
deletes are fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import shard_of  # identical sharding: pmod(url_hash, P)

__all__ = [
    "shard_of", "build_shards", "update_shards", "dedup_and_probe",
    "probe", "delete_keys", "SHARD_BITS_DEFAULT",
]

SLOTS = 4
FP_BITS = 16
# bits of table per shard: 1<<21 bits = 256 KiB = 1<<15 buckets × 4 × 16b;
# capacity ≈ 0.95 · 4 · 32768 ≈ 124k keys/shard at the standard 95% load
SHARD_BITS_DEFAULT = 1 << 21
MAX_KICKS = 500

_MIX = np.uint64(0x5BD1E995)  # MurmurHash2 multiplier — spreads fp for i2


def _buckets_of(bits: int) -> int:
    m = bits // (SLOTS * FP_BITS)
    if m & (m - 1):
        raise ValueError(f"shard table must have power-of-two buckets, got {m}")
    return m


def _fp_i1(hashes: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint uint16 never-0, primary bucket) per key, vectorized."""
    h = hashes.astype(np.uint64)
    fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 is the empty-slot sentinel
    i1 = (h % np.uint64(m)).astype(np.int64)
    return fp, i1


def _i2(i1: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """Partner bucket: i1 XOR mix(fp), in-range because m is a power of 2."""
    mixed = (fp.astype(np.uint64) * _MIX) & np.uint64(m - 1)
    return (i1.astype(np.uint64) ^ mixed).astype(np.int64)


def _place_wave(table: np.ndarray, bkt: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Place each (bkt, fp) into a free slot of its bucket where capacity
    allows; returns the boolean placed-mask. Fully vectorized: candidates
    are ranked within their bucket (stable sort + running count) and the
    k-th candidate takes the bucket's k-th empty slot iff k < free."""
    n = len(bkt)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(bkt, kind="stable")
    sb = bkt[order]
    # rank of each candidate within its bucket group
    first = np.zeros(n, dtype=np.int64)
    first[1:] = np.cumsum(sb[1:] != sb[:-1])
    starts = np.zeros(n, dtype=np.int64)
    idx_first = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    starts = np.repeat(idx_first, np.diff(np.r_[idx_first, n]))
    rank = np.arange(n) - starts
    # k-th empty slot per touched bucket: argsort puts empty (True) first
    touched = sb[idx_first]
    empty = table[touched] == 0           # (t, SLOTS)
    free = empty.sum(axis=1)              # (t,)
    slot_order = np.argsort(~empty, axis=1, kind="stable")  # empties first
    ok = rank < np.repeat(free, np.diff(np.r_[idx_first, n]))
    gsel = first[ok]                      # group index per placed candidate
    table[sb[ok], slot_order[gsel, rank[ok]]] = fp[order][ok]
    placed = np.zeros(n, dtype=bool)
    placed[order[ok]] = True
    return placed


def _insert_batch(table: np.ndarray, hashes: np.ndarray, m: int) -> None:
    """Insert all hashes into the (m, SLOTS) table, mutating it.

    Wave 1: i1 free slots. Wave 2: i2 free slots. Residue: sequential
    partial-key eviction (bounded MAX_KICKS per item — exceeding it means
    the shard is past design load; sizing guarantees it can't at the
    engine's defaults, so it raises rather than silently degrade)."""
    fp, i1 = _fp_i1(hashes, m)
    placed = _place_wave(table, i1, fp)
    if not placed.all():
        rest = ~placed
        i2 = _i2(i1[rest], fp[rest], m)
        placed2 = _place_wave(table, i2, fp[rest])
        if not placed2.all():
            rng = np.random.default_rng(0xC0C0)  # deterministic eviction walk
            for f, b in zip(fp[rest][~placed2], i1[rest][~placed2]):
                f = np.uint16(f)
                cur = int(b)
                for _ in range(MAX_KICKS):
                    row = table[cur]
                    free_slots = np.flatnonzero(row == 0)
                    if len(free_slots):
                        row[free_slots[0]] = f
                        break
                    victim = int(rng.integers(SLOTS))
                    f, row[victim] = row[victim], f
                    cur = int(
                        _i2(np.array([cur]), np.array([f], np.uint16), m)[0]
                    )
                else:
                    raise RuntimeError(
                        "cuckoo shard over design load (MAX_KICKS exceeded); "
                        "increase shard_bits or num_shards"
                    )


def _contains(table: np.ndarray, hashes: np.ndarray, m: int) -> np.ndarray:
    fp, i1 = _fp_i1(hashes, m)
    i2 = _i2(i1, fp, m)
    return ((table[i1] == fp[:, None]).any(axis=1)
            | (table[i2] == fp[:, None]).any(axis=1))


def _delete(table: np.ndarray, hashes: np.ndarray, m: int) -> np.ndarray:
    """Remove ONE stored occurrence per present key; returns removed-mask.

    Vectorized slot pick with conflict repair: distinct keys that collide
    on (bucket, slot) — same fp, same bucket — are resolved sequentially
    (at 16-bit fingerprints that's a ~2^-31 event per pair)."""
    fp, i1 = _fp_i1(hashes, m)
    i2 = _i2(i1, fp, m)
    m1 = table[i1] == fp[:, None]
    m2 = table[i2] == fp[:, None]
    in1 = m1.any(axis=1)
    use2 = ~in1 & m2.any(axis=1)
    found = in1 | use2
    bkt = np.where(in1, i1, i2)
    slot = np.where(in1, m1.argmax(axis=1), m2.argmax(axis=1))
    sel = np.flatnonzero(found)
    flat = bkt[sel] * SLOTS + slot[sel]
    uniq, first_idx = np.unique(flat, return_index=True)
    table.reshape(-1)[uniq] = 0
    dup = np.ones(len(sel), dtype=bool)
    dup[first_idx] = False
    for j in np.flatnonzero(dup):  # conflict repair, astronomically rare
        k = sel[j]
        row1, row2 = table[i1[k]], table[i2[k]]
        if (row1 == fp[k]).any():
            row1[(row1 == fp[k]).argmax()] = 0
        elif (row2 == fp[k]).any():
            row2[(row2 == fp[k]).argmax()] = 0
        else:
            found[k] = False
    return found


def _to_bytes(table: np.ndarray) -> bytes:
    return table.astype("<u2").tobytes()


def _from_bytes(raw: bytes, m: int) -> np.ndarray:
    return np.frombuffer(raw, dtype="<u2").astype(np.uint16).reshape(m, SLOTS).copy()


# --------------------------------------------------------------- Spark API
# Signatures mirror bloom.py exactly — CrawlEngine(seen_filter="cuckoo")
# swaps the module reference and nothing else changes.

def build_shards(
    url_seen: DataFrame, num_shards: int, shard_bits: int = SHARD_BITS_DEFAULT
) -> DataFrame:
    """url_seen(url_hash, ...) → shards(shard_id int, bits binary)."""
    m = _buckets_of(shard_bits)
    hashed = url_seen.select(
        F.col("url_hash"), shard_of(F.col("url_hash"), num_shards).alias("shard_id")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((m, SLOTS), dtype=np.uint16)
        if len(pdf):
            _insert_batch(table, pdf["url_hash"].to_numpy(np.int64), m)
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])], "bits": [_to_bytes(table)]}
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
    """Insert a wave's new hashes into existing shards — O(delta + P·table)
    per wave, never a rebuild (bloom.update_shards contract)."""
    m = _buckets_of(shard_bits)
    hashed = delta.select(
        F.col(hash_col), shard_of(F.col(hash_col), num_shards).alias("shard_id")
    )

    def merge(key, bits_rows: pd.DataFrame, hash_rows: pd.DataFrame) -> pd.DataFrame:
        if len(bits_rows):
            table = _from_bytes(bits_rows["bits"].iloc[0], m)
            sid = int(bits_rows["shard_id"].iloc[0])
        else:
            table = np.zeros((m, SLOTS), dtype=np.uint16)
            sid = int(hash_rows["shard_id"].iloc[0])
        if len(hash_rows):
            _insert_batch(table, hash_rows[hash_col].to_numpy(np.int64), m)
        return pd.DataFrame({"shard_id": [sid], "bits": [_to_bytes(table)]})

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
    """Fused in-batch dedup + cuckoo probe in ONE shard-keyed shuffle —
    the same admission contract as bloom.dedup_and_probe: keep the
    (priority DESC, seq ASC) winner per hash, then flag maybe_seen."""
    m = _buckets_of(shard_bits)
    left = candidates.withColumn("shard_id", shard_of(F.col(hash_col), num_shards))

    def do(key, cand: pd.DataFrame, bits_rows: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return cand.drop(columns=["shard_id"]).assign(
                maybe_seen=pd.Series([], dtype=bool)
            )
        cand = cand.sort_values(
            [priority_col, seq_col], ascending=[False, True], kind="mergesort"
        ).drop_duplicates(subset=[hash_col], keep="first")
        if len(bits_rows) == 0:
            maybe = np.zeros(len(cand), dtype=bool)
        else:
            table = _from_bytes(bits_rows["bits"].iloc[0], m)
            maybe = _contains(table, cand[hash_col].to_numpy(np.int64), m)
        out = cand.drop(columns=["shard_id"]).copy()
        out["maybe_seen"] = maybe
        return out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"
    return (
        left.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(do, schema=out_schema)
    )


def probe(
    candidates: DataFrame,
    shards: DataFrame,
    num_shards: int,
    shard_bits: int = SHARD_BITS_DEFAULT,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Append ``maybe_seen boolean`` — bloom.probe's contract, cuckoo bits."""
    m = _buckets_of(shard_bits)
    left = candidates.withColumn("shard_id", shard_of(F.col(hash_col), num_shards))

    def do(key, cand: pd.DataFrame, bits_rows: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return cand.drop(columns=["shard_id"]).assign(
                maybe_seen=pd.Series([], dtype=bool)
            )
        if len(bits_rows) == 0:
            maybe = np.zeros(len(cand), dtype=bool)
        else:
            table = _from_bytes(bits_rows["bits"].iloc[0], m)
            maybe = _contains(table, cand[hash_col].to_numpy(np.int64), m)
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
        .applyInPandas(do, schema=out_schema)
    )


def delete_keys(
    shards: DataFrame,
    keys: DataFrame,
    num_shards: int,
    shard_bits: int = SHARD_BITS_DEFAULT,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Remove keys from the filter — the capability the bloom lacks.

    Powers recrawl/TTL expiry: expire url_seen rows past their freshness
    window, delete their fingerprints here, and the URLs become admissible
    again without rebuilding filter state. Cuckoo delete semantics apply:
    only delete keys that were actually inserted (deleting a never-
    inserted key can evict a colliding fingerprint — CoNEXT'14 §3.3);
    expiry flows always read the keys from url_seen, which guarantees it.
    Untouched shards pass through byte-identical."""
    m = _buckets_of(shard_bits)
    hashed = keys.select(
        F.col(hash_col), shard_of(F.col(hash_col), num_shards).alias("shard_id")
    )

    def merge(key, bits_rows: pd.DataFrame, hash_rows: pd.DataFrame) -> pd.DataFrame:
        if len(bits_rows) == 0:
            # deleting from a shard that never existed: nothing to emit
            return pd.DataFrame({"shard_id": [], "bits": []}).astype(
                {"shard_id": "int64"}
            )
        if len(hash_rows) == 0:
            return bits_rows[["shard_id", "bits"]]
        table = _from_bytes(bits_rows["bits"].iloc[0], m)
        _delete(table, hash_rows[hash_col].to_numpy(np.int64), m)
        return pd.DataFrame(
            {"shard_id": [int(bits_rows["shard_id"].iloc[0])],
             "bits": [_to_bytes(table)]}
        )

    return (
        shards.groupBy("shard_id")
        .cogroup(hashed.groupBy("shard_id"))
        .applyInPandas(merge, schema="shard_id int, bits binary")
    )
