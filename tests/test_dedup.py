"""Dedup operator properties on planted fixtures (SURVEY.md §5 plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from review_crawler_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word change → high jaccard
FAR = (
    "completely different content about spark partitions and shuffle "
    "boundaries with no overlap whatsoever in the shingle space at all"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en", "srcA"),
        (2, BASE, "en", "srcA"),          # exact dup of 1
        (3, NEAR, "en", "srcA"),          # near dup of 1
        (4, FAR, "en", "srcB"),
        (5, "Tiny.", "en", "srcB"),       # shorter than shingle k
        (6, BASE.upper() + "!!!", "en", "srcC"),  # dup of 1 after normalize
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_exact_dedup_groups(docs):
    groups = {r["canonical_id"]: r["group_size"] for r in D.exact_dedup_groups(docs).collect()}
    assert groups[1] == 3  # 1, 2, 6 collapse after normalization
    assert groups[4] == 1


def test_drop_exact_duplicates(docs):
    kept = {r["doc_id"] for r in D.drop_exact_duplicates(docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # exact dup always survives
    assert (1, 3) in pairs  # near dup found
    assert not any(4 in p for p in pairs)  # disjoint text never pairs


def test_minhash_signature_null_for_short_docs(docs):
    sigs = {r["doc_id"]: r["sig"] for r in D.minhash_signature(docs).collect()}
    assert sigs[5] is None
    assert sigs[1] is not None and len(sigs[1]) == 32


def test_simhash_near_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(docs, max_hamming=7).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical text → identical simhash
    assert (1, 3) in pairs  # near dup within hamming budget
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_exact_recall_within_budget(spark, docs):
    """Banding must lose NOTHING within the hamming budget: compare against
    a brute-force all-pairs hamming computation."""
    import itertools

    idx = {r["doc_id"]: r["simhash"] for r in D.simhash_index(docs).collect()}
    brute = {
        (a, b): bin((idx[a] ^ idx[b]) & ((1 << 64) - 1)).count("1")
        for a, b in itertools.combinations(sorted(idx), 2)
    }
    for budget in (1, 3, 5, 7):
        got = {
            (r["id_a"], r["id_b"])
            for r in D.simhash_near_pairs(docs, max_hamming=budget).collect()
        }
        want = {p for p, h in brute.items() if h <= budget}
        assert got == want, (budget, got, want)


def test_simhash_budget_beyond_exact_range_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.simhash_near_pairs(None, max_hamming=8)


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, bucket_col="lang", shingle_k=2, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),      # orthogonal
        (4, [1.0, 0.0, 0.0, 0.0], 1),      # same vec, other bucket
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_dup_pairs(emb, threshold=0.98).collect()
    }
    assert pairs == {(1, 2)}


def test_semantic_dedup_clusters(spark):
    """SemDeDup over learned k-means cells: two planted near-dup groups in
    well-separated regions of the space cluster correctly (each group lands
    in one cell, members labeled with the min id and the right size);
    vectors far from everything stay out of the output (no cluster)."""
    rows = [
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [0.99, 0.015, 0.0, 0.0]),   # near dup of 1
        (3, [0.98, 0.012, 0.01, 0.0]),  # near dup of 1 and 2 (size-3 group)
        (10, [0.0, 0.0, 1.0, 0.02]),
        (11, [0.0, 0.0, 0.99, 0.018]),  # near dup of 10
        (50, [0.0, 1.0, 0.0, 0.0]),     # orthogonal singleton
        (51, [0.5, 0.5, 0.5, 0.5]),     # diagonal singleton
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cluster_id"], r["cluster_size"])
        for r in D.semantic_dedup_clusters(
            emb, n_centroids=4, threshold=0.95, train_n=100
        ).collect()
    }
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
    }


def test_minhash_index_probe_no_corpus_exchange(spark, tmp_path):
    """Incremental slice-vs-index dedup: (a) the probe finds exactly the
    planted cross-partition near-dups, (b) the probe join's plan reads the
    index as a BUCKETED scan with zero Exchange on the corpus side (the
    only Exchange is the slice's band keys), and (c) a catalog-loss
    re-registration (fresh session analog: DROP TABLE, re-register from
    the on-disk spec) serves identical results without a rebuild."""
    import re

    corpus = spark.createDataFrame(
        [(10, BASE), (11, FAR), (12, NEAR)], "doc_id long, text string"
    )
    sl = spark.createDataFrame(
        [(100, BASE), (101, "nothing shared with anything here at all")],
        "doc_id long, text string",
    )
    table, path = "mh_idx_test", str(tmp_path / "mh_idx")
    D.write_minhash_band_index(corpus, table, path, num_buckets=4)

    out = D.minhash_probe_index(sl, table, est_threshold=0.4)
    rows = {(r["slice_id"], r["corpus_id"]) for r in out.collect()}
    assert (100, 10) in rows          # exact text → all lanes agree
    assert all(s != 101 for s, _ in rows)  # disjoint doc pairs with nothing

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            D.minhash_probe_index(sl, table, est_threshold=0.4).explain(
                "formatted"
            )
        p = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "Bucketed: true" in p, p
    # exactly one Exchange feeding the candidate join: the slice side.
    # (the downstream pair groupBy re-aggregates, so allow its exchange;
    # the INDEX scan itself must not be followed by one — bucketed scans
    # print SelectedBucketsCount)
    assert "SelectedBucketsCount" in p, p

    spark.sql(f"DROP TABLE {table}")
    assert not spark.catalog.tableExists(table)
    assert D.ensure_minhash_index_registered(spark, table, path)
    rows2 = {
        (r["slice_id"], r["corpus_id"])
        for r in D.minhash_probe_index(sl, table, est_threshold=0.4).collect()
    }
    assert rows2 == rows


def test_winnowing_fingerprints_match_pure_python(spark):
    """Spark winnow == from-scratch python winnow on known docs, and shared
    runs of >= window+k-1 words yield shared fingerprints (the winnowing
    guarantee) even when the run's position shifts."""
    import hashlib
    import re as _re

    def py_winnow(text, k=3, window=4):
        norm = _re.sub(r"\s+", " ", _re.sub(r"[^\w\s]", "", text.lower(), flags=_re.ASCII), flags=_re.ASCII).strip()
        words = norm.split(" ")
        if len(words) < k:
            return set()
        sh = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh]
        return {min(hs[i:i + window]) for i in range(len(hs))}

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (1, f"intro words here. {shared} trailing remark"),
        (2, f"{shared} completely different ending text goes on and on"),
        (3, "nothing in common with anything else at all whatsoever today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in D.winnowing_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for doc_id, text in docs:
        assert got[doc_id] == py_winnow(text), doc_id
    # position-robustness: docs 1 and 2 share the run at different offsets
    assert got[1] & got[2], "shared run must share fingerprints"
    assert not (got[3] & got[1])


def test_ngram_contamination_matches_python_and_broadcasts(spark):
    """Decontamination == brute-force python n-gram overlap on known docs;
    the bench side broadcasts (no shuffle of the gram-hash join)."""
    import contextlib
    import io

    from review_crawler_spark.operators.decontam import ngram_contamination

    train = [
        (1, "a b c d e f g"),          # shares "c d e" with bench doc 10
        (2, "x y z w v u t"),          # clean
        (3, "c d e f g h i c d e"),    # shares two distinct grams w/ 10
        (4, "a b"),                    # too short for n=3
    ]
    bench = [
        (10, "q q c d e f g q"),
        (11, "m n o p"),
    ]

    def grams(t, n=3):
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()

    expected = {}
    for did, t in train:
        hits = {bid: grams(t) & grams(bt) for bid, bt in bench}
        hits = {b: g for b, g in hits.items() if g}
        if hits:
            expected[did] = (
                len(set().union(*hits.values())),
                len(hits),
            )

    tdf = spark.createDataFrame(train, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    out = ngram_contamination(tdf, bdf, n=3)
    got = {r["doc_id"]: (r["n_overlapping_grams"], r["n_bench_docs"])
           for r in out.collect()}
    assert got == expected, (got, expected)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, "bench grams must broadcast"
    # the train-side gram explosion must reach the join with NO shuffle
    # (left subtree of the join = the ':-'-prefixed lines): the only
    # exchanges are the bench distinct and the post-join countDistinct
    tree = plan.split("== Physical Plan ==")[1].split("(1) ")[0]
    join_at = tree.index("BroadcastHashJoin")
    left_lines = [
        ln for ln in tree[join_at:].splitlines() if ln.lstrip().startswith(":")
    ]
    assert left_lines, "expected a left subtree under the join"
    assert not any("Exchange" in ln for ln in left_lines), (
        "train gram explosion must not shuffle before the join:\n" + tree
    )
