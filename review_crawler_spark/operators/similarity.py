"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (pure JVM fold — no UDF);
the scale path is an LSH-bucketed approximate variant: random-hyperplane
signatures prune the candidate set to matching buckets before the exact
rescore. At 100 TB the bucket join replaces the all-pairs scan: candidates
shuffle on the signature key only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _spread(df: DataFrame) -> DataFrame:
    """Scale out single-file inputs before per-row vector math (see
    operators/dedup._spread — inputFiles() probe, no RDD conversion)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    return df.repartition(target)


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The query is a literal array (broadcast by constant folding); the scan
    computes one double per row and TakeOrderedAndProject keeps the global
    top-k — no full sort, no shuffle of payloads.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    v = _as_double(vec_col)
    scored = _spread(embeddings).select(
        F.col(id_col),
        F.round(_dot(v, q) / (_norm(v) * F.lit(qn)), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplane_signatures(
    embeddings: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig int) — random-hyperplane LSH signature per row.

    Planes are a deterministic numpy matrix (seeded) broadcast into an
    Arrow-batched pandas UDF; the matmul is one BLAS call per batch.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))

    @F.pandas_udf(T.IntegerType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        bits = (mat @ planes) > 0
        vals = np.zeros(len(vecs), dtype=np.int64)
        for b in range(num_planes):
            vals |= bits[:, b].astype(np.int64) << b
        return pd.Series(vals.astype(np.int32))

    return embeddings.select(F.col(id_col), sig_udf(F.col(vec_col)).alias("sig"))


def ann_topk_lsh(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket prune, then exact rescore.

    Candidates = rows whose signature is within ``max_hamming`` bits of the
    query signature (bucket keys enumerated driver-side — C(planes, ≤h) keys,
    a tiny IN-list the optimizer turns into a hash probe). Recall is tested
    against the brute-force baseline in tests/test_similarity.py.
    """
    dim = len(query)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    qbits = (np.asarray(query) @ planes) > 0
    qsig = 0
    for b in range(num_planes):
        qsig |= int(qbits[b]) << b

    keys = {qsig}
    if max_hamming >= 1:
        for i in range(num_planes):
            keys.add(qsig ^ (1 << i))
    if max_hamming >= 2:
        for i in range(num_planes):
            for j in range(i + 1, num_planes):
                keys.add(qsig ^ (1 << i) ^ (1 << j))
    if max_hamming >= 3:
        for i in range(num_planes):
            for j in range(i + 1, num_planes):
                for m in range(j + 1, num_planes):
                    keys.add(qsig ^ (1 << i) ^ (1 << j) ^ (1 << m))

    sigs = hyperplane_signatures(
        embeddings, num_planes=num_planes, dim=dim, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    cand = embeddings.join(
        sigs.filter(F.col("sig").isin([int(x) for x in keys])).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


# ------------------------------------------------------------------ IVF

def _unit(m: np.ndarray) -> np.ndarray:
    """L2-normalize rows (float64). Cosine search needs a SPHERICAL
    quantizer: L2 distance on the unit sphere is monotone in cosine, so
    normalized assignment buckets align with cosine neighborhoods."""
    norms = np.sqrt((m ** 2).sum(axis=1))
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic spherical Lloyd's k-means (float64, unit-normalized
    input rows, fixed init = first k rows, fixed iteration count,
    per-centroid distance loop). The exact float recipe is replicated by
    the oracle generator (tools/gen_expected.py) — keep the two in
    lock-step if either changes."""
    sample = _unit(sample)
    # fewer rows than requested centroids → degrade to one centroid per
    # row instead of indexing past the sample (the oracle generator
    # clamps identically)
    k = min(k, len(sample))
    centroids = sample[:k].copy()
    for _ in range(iters):
        dists = np.stack(
            [((sample - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        assign = dists.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def centroid_assign_col(centroids: np.ndarray, vec_col: str = "embedding") -> Column:
    """Nearest-centroid bucket id as a column expression (Arrow-batched
    BLAS) — usable as a narrow projection on the full frame, so callers
    never need an (id → bucket) join back onto the table."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        mat = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        dists = np.stack([((mat - c) ** 2).sum(axis=1) for c in cent], axis=1)
        return pd.Series(dists.argmin(axis=1).astype(np.int32))

    return assign_udf(F.col(vec_col))


def ivf_assignments(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — nearest-centroid assignment, Arrow-batched BLAS."""
    return embeddings.select(
        F.col(id_col), centroid_assign_col(centroids, vec_col).alias("bucket")
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_n: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → probe the nprobe
    nearest inverted lists → exact cosine rescore.

    The quantizer trains on a DETERMINISTIC sample (first ``train_n`` rows
    by id — tiny driver-side collect, exactly how a 100 TB deployment
    trains its coarse quantizer on a sample) so results are reproducible
    and oracle-checkable. At scale the bucket column is a partition key:
    probing reads nprobe/n_centroids of the data, no full scan.
    """
    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    centroids = _kmeans_fit(sample, n_centroids)

    q = _unit(np.asarray(query, dtype=np.float64)[None, :])[0]
    qd = np.array([((q - c) ** 2).sum() for c in centroids])
    probe = [int(b) for b in qd.argsort(kind="stable")[:nprobe]]

    assigned = ivf_assignments(embeddings, centroids, id_col, vec_col)
    cand = embeddings.join(
        assigned.filter(F.col("bucket").isin(probe)).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


# ------------------------------------------------------- persisted IVF index

def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    train_n: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize an IVF index: rows written as parquet PARTITIONED BY
    their inverted-list bucket, centroids in a JSON sidecar.

    This is the at-scale form of ann_topk_ivf's closing claim — with the
    bucket as a partition column, a query reads only its nprobe probed
    lists via partition pruning (PartitionFilters in the scan; pinned by
    tests/test_similarity_index.py) instead of scanning and assigning the
    whole table per query. Training is the same deterministic recipe as
    ann_topk_ivf (first train_n rows by id through _kmeans_fit), so the
    indexed search returns identical results."""
    import json
    import os

    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    centroids = _kmeans_fit(sample, n_centroids)
    assigned = ivf_assignments(embeddings, centroids, id_col, vec_col)
    (
        embeddings.join(assigned, id_col)
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )
    sidecar = os.path.join(path, "_centroids.json")
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"centroids": centroids.tolist()}, f)
    os.rename(tmp, sidecar)
    return centroids


def ann_topk_ivf_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted IVF index: probe-list selection is a
    PARTITION FILTER — the scan reads nprobe/n_centroids of the files,
    no assignment pass, no full-table I/O."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    q = _unit(np.asarray(query, dtype=np.float64)[None, :])[0]
    qd = np.array([((q - c) ** 2).sum() for c in centroids])
    probe = [int(b) for b in qd.argsort(kind="stable")[:nprobe]]
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probe))
    return cosine_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


# -------------------------------------------------------- product quantization

def pq_train_codebooks(
    sample: np.ndarray, m: int = 8, ks: int = 16, iters: int = 5,
    unit_rows: bool = True,
) -> np.ndarray:
    """Per-subspace deterministic Lloyd's codebooks (Jégou et al., TPAMI'11
    product quantization). Rows are unit-normalized FIRST (cosine → L2 on
    the sphere, same argument as the IVF coarse quantizer), then split into
    ``m`` contiguous subspaces; each subspace trains an independent
    ``ks``-word codebook with the exact deterministic recipe
    ``_kmeans_fit`` commits to (init = first ks sub-rows, fixed iteration
    count, per-centroid distance loop, float64). The oracle generator
    (tools/gen_expected.ann_pq_expected) replicates this float-for-float —
    keep the two in lock-step if either changes.

    With ``unit_rows=False`` the rows are taken as-is — the IVF-PQ path
    trains on RESIDUALS (vector minus its coarse centroid), which are not
    unit vectors and must not be re-normalized.

    Returns an (m, ks, D/m) float64 array.
    """
    sample = sample.astype(np.float64)
    if unit_rows:
        sample = _unit(sample)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = []
    for j in range(m):
        block = sample[:, j * sub:(j + 1) * sub]
        k = min(ks, len(block))
        cb = block[:k].copy()
        for _ in range(iters):
            dists = np.stack([((block - c) ** 2).sum(axis=1) for c in cb], axis=1)
            assign = dists.argmin(axis=1)
            for c in range(k):
                members = block[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    return np.stack(books)


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed representation: m codeword
    ids per vector (m bytes at ks ≤ 256) instead of D floats. At 100 TB of
    float32 embeddings this is the representation the candidate scan reads:
    D=64/m=8/ks=256 is 256 B → 8 B per row, a 32× I/O reduction on the
    exhaustive ADC pass. One Arrow-batched BLAS pass, zero shuffle."""
    books = codebooks.astype(np.float64)
    m, _, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode_udf(vecs: pd.Series) -> pd.Series:
        mat = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        n = len(mat)
        codes = np.zeros((n, m), dtype=np.int32)
        for j in range(m):
            block = mat[:, j * sub:(j + 1) * sub]
            dists = np.stack(
                [((block - c) ** 2).sum(axis=1) for c in books[j]], axis=1
            )
            codes[:, j] = dists.argmin(axis=1)
        return pd.Series(list(codes))

    return embeddings.select(
        F.col(id_col), encode_udf(F.col(vec_col)).alias("codes")
    )


def ann_topk_pq(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    rerank: int = 50,
    train_n: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k: asymmetric distance computation (ADC) over the
    compressed codes, exact cosine rescore of the top ``rerank`` candidates.

    Plan at scale:
    1. codebooks train on the same deterministic sample recipe as IVF
       (first train_n rows by id — tiny justified collect);
    2. the ADC scan reads ONLY the m-byte codes (32× less I/O than the
       vectors at m=8 vs D=64 float32): per row, approximate distance =
       Σ_j table[j][code_j] where table is the (m × ks) query-to-codeword
       distance table, closed over into one Arrow pass — no shuffle;
    3. top-``rerank`` by (adc, id) is TakeOrderedAndProject (no full sort);
    4. only the rerank winners' full vectors are re-read (semi join) for
       the exact cosine — candidate I/O bounded by rerank, not corpus size.

    Ties at the rerank boundary break on id (stable both here and in the
    lock-step oracle), so the candidate set is deterministic.
    """
    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    books = pq_train_codebooks(sample, m=m, ks=ks)
    sub = books.shape[2]

    q = _unit(np.asarray(query, dtype=np.float64)[None, :])[0]
    # ADC table: exact L2² from each query sub-vector to every codeword
    table = np.stack(
        [((books[j] - q[j * sub:(j + 1) * sub]) ** 2).sum(axis=1)
         for j in range(books.shape[0])]
    )

    codes = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)

    @F.pandas_udf(T.DoubleType())
    def adc_udf(code_col: pd.Series) -> pd.Series:
        mat = np.stack(code_col.to_numpy()).astype(np.int64)
        # fixed left-to-right subspace summation — the oracle folds the
        # same axis in the same order
        dist = np.take_along_axis(
            table, mat.T, axis=1
        ).sum(axis=0)
        return pd.Series(dist)

    cand_ids = (
        codes.select(F.col(id_col), adc_udf(F.col("codes")).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(rerank)
        .select(id_col)
    )
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


def ann_topk_ivf_indexed_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch multi-query top-k over the persisted IVF index — the shape a
    training-data pipeline actually runs (near-dup a whole crawl slice
    against the corpus index, millions of queries at once).

    Plan at scale:
    1. probe assignment — one Arrow-batched BLAS pass over the QUERY table
       (queries × centroids, centroids closed over — tiny), emitting nprobe
       bucket ids per query; the index is never scanned for assignment;
    2. index scan — STATIC partition pruning to the union of probed buckets
       (≤ n_centroids ints collected from the tiny distinct — bounded by
       the centroid count, not the query count), so the scan reads
       |union(probes)|/n_centroids of the files;
    3. candidate join on bucket — the only query-volume shuffle; both sides
       carry just (ids, vectors); AQE picks broadcast when the probed query
       side is small;
    4. exact cosine rescore (JVM sequential fold, matching the pure-Python
       oracle's float64 fold bit-for-bit) + per-query windowed top-k.

    Returns (query_id, vec_id, cosine), k rows per query.
    """
    import json
    import os

    from pyspark.sql import Window

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    nprobe = min(nprobe, len(centroids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        mat = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        dists = np.stack(
            [((mat - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        order = np.argsort(dists, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    # cached: the bucket_ids collect below and the candidate join both
    # consume it — without the cache the Arrow probe-assignment pass and
    # the full query-table scan execute twice per call
    probed = (
        queries.select(
            F.col(query_id_col),
            _as_double(query_vec_col).alias("_qv"),
            probe_udf(F.col(query_vec_col)).alias("_probes"),
        )
        .withColumn("bucket", F.explode("_probes"))
        .drop("_probes")
    ).cache()
    # union of probed lists: bounded by n_centroids (NOT query count) —
    # the one justified driver collect, powering static partition pruning
    bucket_ids = sorted(
        r["bucket"] for r in probed.select("bucket").distinct().collect()
    )
    index = spark.read.parquet(path).filter(F.col("bucket").isin(bucket_ids))
    v = _as_double(vec_col)
    scored = index.join(probed, "bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            _dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv"))), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


# ------------------------------------------------------------------ IVF-PQ

def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    train_n: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize an IVF-PQ index (Jégou et al. TPAMI'11 §IV) — the
    composition that serves billion-vector search in production systems:
    a coarse spherical quantizer routes each vector to an inverted list
    (parquet partition), and within the list the vector is stored as m
    PQ codes of its RESIDUAL (unit vector minus its coarse centroid).
    Residuals have far smaller variance than raw vectors, so the same
    codebook budget quantizes them much more accurately — that is the
    reason IVF-PQ beats flat PQ at equal bytes.

    Layout: parquet PARTITIONED BY bucket with columns
    (id, codes array<int>, raw vector); sidecar ``_ivfpq.json`` carries
    centroids + codebooks. The ADC scan reads ONLY (id, codes) via column
    pruning — m bytes/row instead of D floats — and only the probed
    partitions via partition pruning; the raw vector column is touched
    just for the rerank winners.

    Training is deterministic end-to-end (first ``train_n`` rows by id →
    `_kmeans_fit` coarse centroids → the SAME sample's residuals →
    per-subspace Lloyd via ``pq_train_codebooks(unit_rows=False)``), so
    the whole index is reproducible and the oracle generator
    (tools/gen_expected.ann_ivfpq_batch_expected) replicates it
    float-for-float.
    """
    import json
    import os

    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    centroids = _kmeans_fit(sample, n_centroids)

    sample_u = _unit(sample)
    sd = np.stack(
        [((sample_u - c) ** 2).sum(axis=1) for c in centroids], axis=1
    )
    sample_resid = sample_u - centroids[sd.argmin(axis=1)]
    books = pq_train_codebooks(
        sample_resid, m=m, ks=ks, unit_rows=False
    )
    cent = centroids.astype(np.float64)
    bks = books.astype(np.float64)
    mm, _, sub = bks.shape

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("bucket", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        )
    )
    def encode_udf(vecs: pd.Series) -> pd.DataFrame:
        mat = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        dists = np.stack([((mat - c) ** 2).sum(axis=1) for c in cent], axis=1)
        buckets = dists.argmin(axis=1)
        resid = mat - cent[buckets]
        codes = np.zeros((len(mat), mm), dtype=np.int32)
        for j in range(mm):
            block = resid[:, j * sub:(j + 1) * sub]
            dd = np.stack(
                [((block - c) ** 2).sum(axis=1) for c in bks[j]], axis=1
            )
            codes[:, j] = dd.argmin(axis=1)
        return pd.DataFrame(
            {"bucket": buckets.astype(np.int32), "codes": list(codes)}
        )

    (
        embeddings.select(
            F.col(id_col), F.col(vec_col), encode_udf(F.col(vec_col)).alias("_e")
        )
        .select(id_col, vec_col, F.col("_e.bucket").alias("bucket"),
                F.col("_e.codes").alias("codes"))
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )
    sidecar = os.path.join(path, "_ivfpq.json")
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"centroids": centroids.tolist(), "codebooks": books.tolist()}, f
        )
    os.rename(tmp, sidecar)
    return centroids, books


def ann_topk_ivfpq_indexed_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch multi-query top-k over a persisted IVF-PQ index — the full
    billion-scale ANN read path:

    1. probe assignment: one Arrow pass over the QUERY table emits, per
       query, its nprobe nearest lists AND the query's residual w.r.t.
       each probed centroid (ADC under residual encoding compares the
       query residual against the stored code, both relative to the SAME
       list centroid);
    2. index scan: static partition pruning to the union of probed
       buckets; ReadSchema = (id, codes) — the m-byte codes, not the
       D-float vectors (column pruning gives the 32× I/O cut);
    3. ADC: one vectorized Arrow pass per (query, candidate) row —
       decoded = codebook[j][code_j], adc = Σ_j ‖resid_j − decoded_j‖²;
    4. per-query top-``rerank`` by (adc, id) — window row_number, ties on
       id (stable in the lock-step oracle too);
    5. exact rescore: ONLY the winners' raw vectors are re-read from the
       probed partitions (semi join on id), exact cosine JVM fold,
       per-query top-k.

    Returns (query_id, vec_id, cosine), k rows per query.
    """
    import json
    import os

    from pyspark.sql import Window

    with open(os.path.join(path, "_ivfpq.json")) as f:
        side = json.load(f)
    centroids = np.asarray(side["centroids"], dtype=np.float64)
    books = np.asarray(side["codebooks"], dtype=np.float64)
    nprobe = min(nprobe, len(centroids))
    mm, _, sub = books.shape

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("bucket", T.IntegerType()),
                    T.StructField("resid", T.ArrayType(T.DoubleType())),
                ]
            )
        )
    )
    def probe_udf(vecs: pd.Series) -> pd.Series:
        mat = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        dists = np.stack(
            [((mat - c) ** 2).sum(axis=1) for c in centroids], axis=1
        )
        order = np.argsort(dists, axis=1, kind="stable")[:, :nprobe]
        out = []
        for i in range(len(mat)):
            out.append(
                [
                    {
                        "bucket": int(b),
                        "resid": (mat[i] - centroids[b]).tolist(),
                    }
                    for b in order[i]
                ]
            )
        return pd.Series(out)

    # cached: consumed by the tiny bucket-union collect AND the ADC join
    probed = (
        queries.select(
            F.col(query_id_col),
            _as_double(query_vec_col).alias("_qv"),
            F.explode(probe_udf(F.col(query_vec_col))).alias("_p"),
        )
        .select(
            query_id_col,
            "_qv",
            F.col("_p.bucket").alias("bucket"),
            F.col("_p.resid").alias("_resid"),
        )
        .cache()
    )
    bucket_ids = sorted(
        r["bucket"] for r in probed.select("bucket").distinct().collect()
    )

    @F.pandas_udf(T.DoubleType())
    def adc_udf(codes: pd.Series, resid: pd.Series) -> pd.Series:
        cd = np.stack(codes.to_numpy()).astype(np.int64)
        rs = np.stack(resid.to_numpy()).astype(np.float64)
        dist = np.zeros(len(cd))
        for j in range(mm):
            decoded = books[j][cd[:, j]]
            diff = rs[:, j * sub:(j + 1) * sub] - decoded
            dist += (diff ** 2).sum(axis=1)
        return pd.Series(dist)

    index = spark.read.parquet(path).filter(F.col("bucket").isin(bucket_ids))
    scored = index.select(id_col, "codes", "bucket").join(
        probed, "bucket"
    ).select(
        query_id_col,
        id_col,
        "_qv",
        adc_udf(F.col("codes"), F.col("_resid")).alias("adc"),
    )
    wr = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc"), F.asc(id_col)
    )
    cand = (
        scored.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= rerank)
        .select(query_id_col, id_col, "_qv")
    )
    vecs = spark.read.parquet(path).filter(
        F.col("bucket").isin(bucket_ids)
    ).select(id_col, vec_col)
    v = _as_double(vec_col)
    exact = cand.join(vecs, id_col).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            _dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv"))), 6
        ).alias("cosine"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        exact.withColumn("_rk", F.row_number().over(wk))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
