"""Deduplication operators for web-scale corpus pipelines.

The reference deduplicates URLs (Scrapy RFPDupeFilter) and versions
(/root/reference/elife_crawler.py:219-234); a 100 TB training-data pipeline
additionally needs content dedup. All operators below are expressed with
built-in DataFrame ops (JVM-side, codegen'd) except simhash, which uses an
Arrow-batched pandas UDF for the 64-lane bit-count fold.

Scale notes (100 TB):
- exact dedup: one shuffle on the 128-bit digest; map-side partial agg
  applies; digest is computed in the scan projection so only (digest, id)
  shuffles, never the text.
- minhash-LSH: shingles explode to rows and hash as codegen'd scalars with
  map-side partial min() aggregation — shuffle volume is docs × lanes longs;
  candidate pairs come from ONE (band, key) aggregation (no self-join);
  verification joins carry only candidate ids' shingle sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import exploded_word_shingles, normalize_text, word_shingles


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives in
    fewer partitions (single consolidated parquet file, skewed upstream
    coalesce…). The heavy per-row stages below (shingling, hashing) must
    scale out; one extra round-robin shuffle of (id, text) is far cheaper
    than serializing the expression work on one core. Detection uses
    inputFiles() — plan metadata only, no job and no RDD conversion (the
    round-1 df.rdd probe converted the whole plan per call); non-file
    sources (test DataFrames, in-memory) repartition unconditionally, which
    is harmless at their size.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    return df.repartition(target)


# ------------------------------------------------------------------ exact


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text.

    Returns (fingerprint, group_size, canonical_id = min id). md5 so a SQL
    oracle can reproduce it; at scale swap for xxhash64 twice (128 bits).
    """
    return (
        docs.select(
            F.col(id_col),
            F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8")).alias(
                "fingerprint"
            ),
        )
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id row per distinct normalized text (deterministic)."""
    w_fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    tagged = docs.withColumn("_fp", w_fp)
    winners = tagged.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return tagged.join(winners, [id_col, "_fp"], "left_semi").drop("_fp")


# ------------------------------------------------------------------ minhash

def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<bigint>) — minhash over word k-shingles, pure JVM ops.

    Lane ``i`` is ``min over shingles of xxhash64(xxhash64(shingle), i)``:
    each shingle string is hashed ONCE, then the 32 lanes are derived with
    cheap long-hashes — 1 string hash + num_hashes long hashes per shingle
    instead of num_hashes string hashes (the dominant CPU at corpus scale).
    Empty docs (< k words) get a null signature.

    Shape: explode shingles to rows → scalar xxhash64 columns (whole-stage
    codegen) → groupBy(id) with ``num_hashes`` min() lanes (map-side partial
    agg collapses each partition to one row per doc before the shuffle, so
    shuffle volume is docs × num_hashes longs regardless of shingle count).
    Two earlier shapes were rejected: 32 sibling ``F.transform`` lambdas
    collapse to one degenerate lane in PySpark 4 (lambda-variable dedup —
    caught by the pure-Python oracle in tools/gen_expected.py), and a
    transform+aggregate+zip_with fold is interpreted per element (no
    codegen), ~10× slower than the exploded scalar pipeline.
    """
    spread = _spread(docs.select(F.col(id_col), F.col(text_col)))
    sig = _minhash_sig_inner(spread, id_col, text_col, num_hashes, shingle_k)
    # docs with < k words have no shingle rows — restore them with null sig
    return spread.select(id_col).join(sig, id_col, "left")


def _minhash_sig_inner(
    spread: DataFrame, id_col: str, text_col: str, num_hashes: int,
    shingle_k: int,
) -> DataFrame:
    """Signatures for docs that HAVE shingles (one corpus scan, no
    null-restore join). minhash_lsh_pairs consumes this directly: the
    public minhash_signature's restore-left-join costs a second corpus
    scan that the pairs path would immediately filter back out."""
    exploded = exploded_word_shingles(spread, id_col, text_col, k=shingle_k)
    hashed = exploded.select(F.col(id_col), F.xxhash64("_s").alias("_h"))
    lanes = hashed.select(
        F.col(id_col),
        *[F.xxhash64("_h", F.lit(i)).alias(f"_l{i}") for i in range(num_hashes)],
    )
    aggd = lanes.groupBy(id_col).agg(
        *[F.min(f"_l{i}").alias(f"_m{i}") for i in range(num_hashes)]
    )
    return aggd.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def _band_keys_arr(num_hashes: int, bands: int):
    """Array of (band, key) structs over a ``sig`` column: key = xxhash64
    over the band's lane slice. Shared by the in-corpus pair path and the
    persisted band index so both sides of an incremental probe compute
    identical keys."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    1. signatures (explode → scalar hashes → partial-agg min per doc)
    2. band keys: xxhash64 over each band's slice → explode → (band, key)
    3. ONE (band, key) aggregation collects bucket members; pairs with
       id_a < id_b expand via SQL lambdas (no bucket self-join)
    4. exact verify: true Jaccard over shingle sets, computed only for
       candidate ids (semi-join prune), ≥ threshold

    Returns (id_a, id_b, jaccard) — jaccard rounded to 6dp for stable
    comparisons.
    """
    spread_docs = _spread(docs.select(F.col(id_col), F.col(text_col)))
    # inner variant: docs without shingles can't pair anyway, and the public
    # minhash_signature's null-restore join would re-scan the corpus
    sigs = _minhash_sig_inner(
        spread_docs, id_col, text_col, num_hashes, shingle_k
    )
    band_arr = _band_keys_arr(num_hashes, bands)
    buckets = sigs.select(id_col, F.explode(band_arr).alias("bk")).select(
        id_col, "bk.band", "bk.key"
    )
    # One aggregation instead of a bucket self-join: collect each bucket's
    # member ids, keep multi-member buckets, and expand pairs with SQL
    # lambdas. bucket_groups is MATERIALIZED (eager localCheckpoint): it is
    # tiny — only multi-member buckets survive the size filter — but it has
    # two consumers (pairs + candidate ids) and each verify-side join adds
    # another, so without the barrier Spark plans the whole scan→shingle→
    # 32-lane-hash→min-agg signature subtree once PER CONSUMER (~4
    # independent subtrees; round-2 plan audit showed no ReusedExchange).
    # After the checkpoint the corpus is shingled+hashed exactly once for
    # signatures, and everything downstream reads the materialized buckets.
    # Note: a bucket of m near-identical docs expands m²/2 pairs in one task;
    # that fan-out is inherent to LSH (the self-join emits the same pairs),
    # and bands over 64-bit hashes keep non-degenerate buckets tiny.
    bucket_groups = (
        buckets.groupBy("band", "key")
        .agg(F.collect_set(F.col(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    ).localCheckpoint(eager=True)
    pairs_sql = (
        "flatten(transform(_ids, ida -> "
        "transform(filter(_ids, idb -> idb > ida), "
        "idc -> named_struct('id_a', ida, 'id_b', idc))))"
    )
    cand = (
        bucket_groups.select(F.explode(F.expr(pairs_sql)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # Verify-stage prune: recompute shingle sets ONLY for candidate ids, so
    # the verify joins shuffle candidates' shingle arrays — never the whole
    # corpus's. shing is also materialized: the id_a and id_b joins below
    # would otherwise each re-run the pruned corpus scan (and it is small —
    # candidates only).
    cand_ids = (
        bucket_groups.select(F.explode("_ids").alias(id_col)).distinct()
    )
    shing = (
        spread_docs
        .join(cand_ids, id_col, "left_semi")
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("_set"),
        )
    ).localCheckpoint(eager=True)
    verified = (
        cand.join(shing.withColumnRenamed(id_col, "id_a").withColumnRenamed("_set", "_sa"), "id_a")
        .join(shing.withColumnRenamed(id_col, "id_b").withColumnRenamed("_set", "_sb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ------------------------------------------------------------------ jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_col: str = "source",
    shingle_k: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard within natural buckets (e.g. same source).

    The bucket equi-key bounds the O(n²) self-join; for unbucketed corpora
    use minhash_lsh_pairs instead. Pure built-ins → SQL-oracle friendly.
    """
    shing = _spread(
        docs.select(F.col(id_col), F.col(bucket_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.col(bucket_col).alias("_bucket"),
        F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("_set"),
    ).filter(F.size("_set") > 0)
    a = shing.alias("a")
    b = shing.alias("b")
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("a._set", "b._set"))
                / F.size(F.array_union("a._set", "b._set")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "jaccard",
        )
    )


# ------------------------------------------------------------------ simhash

SIMHASH_SCHEMA = T.LongType()


def _fnv1a64_matrix(uniq_bytes: list[bytes]) -> np.ndarray:
    """FNV-1a 64 of each byte string, vectorized ACROSS strings.

    All strings fold simultaneously, one numpy pass per byte POSITION
    (h = (h ^ b) * prime on a masked uint64 vector) — interpreted-Python
    cost is O(max_len) vector ops, not O(total_bytes) scalar ops. uint64
    multiply wraps natively.
    """
    n = len(uniq_bytes)
    lens = np.fromiter((len(b) for b in uniq_bytes), dtype=np.int64, count=n)
    total = int(lens.sum())
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if total == 0 or n == 0:
        return h
    maxlen = int(lens.max())
    flat = np.frombuffer(b"".join(uniq_bytes), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(total) - np.repeat(offs, lens)
    buf[rows, cols] = flat
    prime = np.uint64(0x100000001B3)
    for p in range(maxlen):
        active = lens > p
        hp = h[active]
        h[active] = (hp ^ buf[active, p].astype(np.uint64)) * prime
    return h


@F.pandas_udf(SIMHASH_SCHEMA)
def simhash_udf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token arrays — Arrow batch in, numpy fold inside.

    Per batch: FNV-1a-64 every unique token via the byte-position-vectorized
    fold (_fnv1a64_matrix — no per-byte Python), unpack hashes to a bit
    matrix, segment-sum per row with add.reduceat (token runs arrive
    row-contiguous from Arrow), majority-sign → bits.
    """
    out = np.zeros(len(tokens), dtype=np.int64)
    flat: list[str] = []
    seg_rows: list[int] = []  # row index per non-null row, in order
    seg_counts: list[int] = []
    for i, toks in enumerate(tokens):
        if toks is None:
            continue
        flat.extend(toks)
        seg_rows.append(i)
        seg_counts.append(len(toks))
    if flat:
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        hs = _fnv1a64_matrix([t.encode("utf-8") for t in uniq])
        tok_h = hs[inv]
        # bits: little-endian byte view + little bitorder = bit 0..63 columns
        bits = np.unpackbits(
            tok_h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        counts = np.asarray(seg_counts, dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonzero = counts > 0
        ones = np.zeros((len(counts), 64), dtype=np.int64)
        if nonzero.any():
            ones[nonzero] = np.add.reduceat(bits, starts[nonzero], axis=0)
        # sign of sum(±1) = (2*ones > n_tokens); ties (acc==0) → bit 0
        sim = (2 * ones > counts[:, None]).astype(np.uint64)
        vals = np.zeros(len(counts), dtype=np.uint64)
        for b in range(64):
            vals |= sim[:, b] << np.uint64(b)
        out[np.asarray(seg_rows)] = vals.astype(np.int64)
    return pd.Series(out)


def simhash_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — tokens split JVM-side, hash folded in Arrow batches."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    return _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), simhash_udf(toks).alias("simhash")
    )


def hamming_near_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(``hash_col``) ≤ max_hamming over any int64
    fingerprint column — EXACT recall. Output: (id_a, id_b, hamming).

    Pigeonhole banding: the 64-bit hash splits into max_hamming+1 chunks;
    any pair within the budget must agree on at least one whole chunk, so
    the chunk-key self-join loses nothing. Chunk count (and thus join
    fan-out) grows with the budget; budgets above 7 get 8 chunks of 8 bits
    which stays exact only to hamming 7 — asserted below.

    Shared engine for `simhash_near_pairs` (text fingerprints) and
    `phash_near_pairs` (perceptual image hashes, input_hint's stored
    ``phash`` column).
    """
    if max_hamming > 7:
        # pigeonhole exactness needs max_hamming ≤ n_chunks - 1 and 64-bit
        # hashes cap the useful chunk count at 8 → budgets beyond 7 would
        # silently lose pairs; refuse instead
        raise ValueError(f"max_hamming={max_hamming} exceeds exact banding range (7)")
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    idx = hashed.select(id_col, F.col(hash_col).alias("simhash"))

    def _key(c: int):
        shifted = F.shiftrightunsigned(F.col("simhash"), c * bits)
        if bits >= 64:
            # budget 0 → a single 64-bit chunk: the key IS the hash (a
            # (1<<64)-1 mask would overflow LongType and is a no-op anyway)
            return shifted
        return shifted.bitwiseAND(F.lit((1 << bits) - 1))

    chunks = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), _key(c).alias("key"))
            for c in range(n_chunks)
        ]
    )
    buckets = idx.select(id_col, "simhash", F.explode(chunks).alias("ck")).select(
        id_col, "simhash", "ck.chunk", "ck.key"
    )
    # One aggregation instead of a bucket self-join (see minhash_lsh_pairs):
    # collect each chunk-bucket's (id, simhash) members, expand pairs and the
    # hamming distance with SQL lambdas — the simhash UDF is evaluated once,
    # not once per join side.
    groups = (
        buckets.groupBy("chunk", "key")
        .agg(
            F.collect_set(
                F.struct(F.col(id_col).alias("id"), F.col("simhash"))
            ).alias("_ms")
        )
        .filter(F.size("_ms") > 1)
    )
    pairs_sql = (
        "flatten(transform(_ms, pa -> "
        "transform(filter(_ms, pb -> pb.id > pa.id), "
        "pc -> named_struct("
        "'id_a', pa.id, 'id_b', pc.id, "
        "'hamming', CAST(bit_count(pa.simhash ^ pc.simhash) AS INT)))))"
    )
    return (
        groups.select(F.explode(F.expr(pairs_sql)).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup text pairs with Hamming(simhash) ≤ max_hamming — EXACT
    recall; fingerprint = token simhash, pair engine = `hamming_near_pairs`.
    """
    if max_hamming > 7:
        # validate before building the index so an out-of-range budget
        # fails fast even when docs is deferred/invalid (pinned by unit)
        raise ValueError(f"max_hamming={max_hamming} exceeds exact banding range (7)")
    idx = simhash_index(docs, id_col, text_col)
    return hamming_near_pairs(idx, id_col, "simhash", max_hamming)


def phash_near_pairs(images: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual near-duplicate image pairs over the input_hint payload
    table's stored ``phash`` column (average-hash of the decoded pixels,
    `functions/images.py:average_phash`) — Hamming ≤ max_hamming, exact
    recall via pigeonhole banding, no decode in the pair path.

    The reference crawler downloads each figure exactly once per URL
    (`/root/reference/plos_crawler.py:190-196` writes files keyed by
    name) but has no content-level image dedup; at 10^10-frontier scale
    re-hosted/mirrored figures need it, and phash-banding is the image
    analog of the text simhash pass: only (image_id, phash) shuffles —
    never ``bytes`` — so the exchange is ~16 bytes/row regardless of
    payload size.
    """
    return hamming_near_pairs(images, "image_id", "phash", max_hamming)


# ------------------------------------------------------------------ embeddings

def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    threshold: float = 0.98,
) -> DataFrame:
    """Embedding-cosine near-duplicates within buckets, pure JVM arithmetic.

    dot/norm via zip_with + aggregate (doubles, sequential fold — bit-stable
    and oracle-reproducible). Bucketing bounds the self-join; for global ANN
    see operators/similarity.py.
    """
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(embeddings).select(
        F.col(id_col),
        (F.col(bucket_col) if bucket_col else F.lit(0)).alias("_bucket"),
        dbl.alias("_v"),
        F.sqrt(
            F.aggregate(
                F.transform(dbl, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("_norm"),
    )
    a = base.alias("a")
    b = base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", F.round(dot / (F.col("a._norm") * F.col("b._norm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


# ----------------------------------------------------------------- semdedup

def semantic_dedup_clusters(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    threshold: float = 0.4,
    train_n: int = 2000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al.,
    arXiv:2303.09540): partition the embedding space with a spherical
    k-means coarse quantizer, detect cosine-near pairs WITHIN each
    k-means cell only, connected-components the pair graph, and label
    every near-duplicate vector with its keep-one cluster
    (id, cluster_id = min member, cluster_size).

    This is the scale recipe for semantic dedup of a 100 TB corpus: the
    quantizer trains on a deterministic ``train_n``-row sample (tiny
    justified collect — exactly how production systems train coarse
    quantizers), assignment is one Arrow-batched narrow projection, and
    the pairwise cosine self-join is bounded per cell (expected cell size
    = n/k), never all-pairs. Cells are the same partition key the IVF
    index uses, so at scale the self-join co-locates by cell. The label
    buckets `embedding_near_dup_pairs` uses are GIVEN metadata; here the
    buckets are LEARNED from the vectors themselves, which is what makes
    cross-label semantic duplicates findable.
    """
    from .components import connected_components
    from .similarity import _kmeans_fit, centroid_assign_col

    sample_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_n)
        .collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    centroids = _kmeans_fit(sample, n_centroids)
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        centroid_assign_col(centroids, vec_col).alias("_sem_cell"),
    )
    pairs = embedding_near_dup_pairs(
        bucketed,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col="_sem_cell",
        threshold=threshold,
    )
    comps = connected_components(pairs, "id_a", "id_b")
    sizes = comps.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comps.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )


# -------------------------------------------------- incremental (slice) dedup

def write_minhash_band_index(
    docs: DataFrame,
    table: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    num_buckets: int = 16,
) -> None:
    """Persist the corpus's MinHash LSH band index as a BUCKETED catalog
    table: one row per (band, key) per document, carrying the document's
    full signature, CLUSTERED BY exactly (band, key).

    This is the production shape of incremental dedup at 100 TB: the
    corpus index is built ONCE per snapshot; every subsequent crawl slice
    probes it via a join that is co-located on the index side (bucketed
    scan, zero Exchange of the corpus — only the slice's band keys
    shuffle; the same commit trick the crawl engine's url_seen table
    uses, crawler/checkpoint.py). A sidecar ``_index_spec.json`` records
    the bucket spec so a fresh session re-registers the existing files
    instead of rebuilding (Spark's in-memory catalog is session-scoped)."""
    import json
    import os

    spread_docs = _spread(docs.select(F.col(id_col), F.col(text_col)))
    sigs = _minhash_sig_inner(
        spread_docs, id_col, text_col, num_hashes, shingle_k
    )
    rows = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_band_keys_arr(num_hashes, bands)).alias("bk"),
        "sig",
    ).select("bk.band", "bk.key", "doc_id", "sig")
    (
        rows.write.format("parquet")
        .bucketBy(num_buckets, "band", "key")
        .sortBy("band", "key")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    cols_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in rows.schema.fields
    )
    spec = {"num_buckets": num_buckets, "cols_ddl": cols_ddl}
    tmp = os.path.join(path, "_index_spec.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(spec, fh)
    os.rename(tmp, os.path.join(path, "_index_spec.json"))


def ensure_minhash_index_registered(spark, table: str, path: str) -> bool:
    """Re-register an on-disk band index in a fresh session's catalog
    (CREATE TABLE over the existing bucketed files — no data rewrite).
    Returns False if no index exists at ``path``."""
    import json
    import os

    spec_file = os.path.join(path, "_index_spec.json")
    if not os.path.exists(spec_file):
        return False
    if spark.catalog.tableExists(table):
        return True
    with open(spec_file) as fh:
        spec = json.load(fh)
    spark.sql(
        f"CREATE TABLE {table} ({spec['cols_ddl']}) USING PARQUET "
        f"CLUSTERED BY (band, key) SORTED BY (band, key) "
        f"INTO {spec['num_buckets']} BUCKETS LOCATION '{path}'"
    )
    return True


def minhash_probe_index(
    slice_docs: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    est_threshold: float = 0.4,
) -> DataFrame:
    """Incremental near-dup: probe a NEW crawl slice against the persisted
    corpus band index → (slice_id, corpus_id, est_jaccard).

    The slice's signatures band-key exactly like the index rows
    (`_band_keys_arr` is shared), the candidate join keys on precisely the
    index's bucket columns so the corpus side never shuffles, and the
    MinHash Jaccard estimate (fraction of agreeing lanes) is one JVM
    zip_with/aggregate fold over the two signatures already carried by
    the joined row — no second corpus scan for verification, which is the
    point: a 100 TB corpus is probed with slice-sized I/O plus the
    matched index buckets."""
    spark = slice_docs.sparkSession
    index = spark.table(table)
    sigs = _minhash_sig_inner(
        _spread(slice_docs.select(F.col(id_col), F.col(text_col))),
        id_col, text_col, num_hashes, shingle_k,
    )
    probe = sigs.select(
        F.col(id_col).alias("slice_id"),
        F.explode(_band_keys_arr(num_hashes, bands)).alias("bk"),
        F.col("sig").alias("slice_sig"),
    ).select("slice_id", "bk.band", "bk.key", "slice_sig")
    est = F.round(
        F.aggregate(
            F.zip_with(
                F.col("slice_sig"), F.col("sig"),
                lambda a, b: (a == b).cast("int"),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / num_hashes,
        6,
    )
    matched = (
        probe.join(index, ["band", "key"])
        .filter(F.col("slice_id") != F.col("doc_id"))
        .select(
            "slice_id", F.col("doc_id").alias("corpus_id"),
            est.alias("est_jaccard"),
        )
    )
    return (
        matched.groupBy("slice_id", "corpus_id")
        # the estimate is a pure function of the two signatures — every
        # band-collision row of a pair carries the identical value
        .agg(F.first("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= est_threshold)
    )


# ------------------------------------------------------------------ winnowing

def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints: (id, fp) distinct rows.

    The classic position-robust document fingerprint (Schleimer/Wilkerson/
    Aiken winnowing): hash every k-word shingle, slide a ``window`` over
    consecutive shingle hashes, keep each window's minimum. Guarantees any
    shared run of ≥ window+k-1 words yields a shared fingerprint, while
    storing ~1/window of the shingles — the retrieval-scale fingerprint the
    reference's whole-document hashing cannot give.

    All relational: exploded shingles (codegen) → per-shingle hash →
    sliding min() window per doc → distinct. The shingle hash is
    conv(md5[:15], 16, 10) — 60 bits, bit-for-bit reproducible in the
    DuckDB oracle ('0x'||substr(md5,1,15) cast) — swap xxhash64 in
    production for ~5× cheaper hashing (same plan shape).

    Scale: the window function shuffles (id, pos, 8-byte hash) — never the
    text; partial distinct collapses fingerprints map-side.
    """
    from ..functions.text import exploded_word_shingles

    sh = exploded_word_shingles(
        _spread(docs.select(F.col(id_col), F.col(text_col))),
        id_col, text_col, k=shingle_k, with_pos=True,
    )
    hashed = sh.select(
        F.col(id_col),
        F.col("_pos"),
        F.conv(F.substring(F.md5(F.encode(F.col("_s"), "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    from pyspark.sql import Window as W

    win = (
        W.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        hashed.select(F.col(id_col), F.min("_h").over(win).alias("fp"))
        .distinct()
    )
