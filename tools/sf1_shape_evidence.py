"""Round-4 VERDICT task 5: sf1.0 shape evidence for the dedup/ANN family.

The driver provides sf{0.001,0.01,0.1}; sf1.0 is synthesized here as a
DETERMINISTIC 10x derivation of sf0.1 (no external data, per round-5
instructions): each replica r in 0..9 re-keys ids (+r*N) and decorrelates
content — documents rotate their word order by r (so shingles differ and
cross-replica rows are NOT near-dups: the pair graph scales exactly 10x,
which is what makes wall-vs-rows linearity a fair test), embeddings
circular-shift their vector by r (norm-preserving).

For each of the five flagship dedup/ANN queries this measures best-of-2
walls at sf0.1 and synthetic sf1.0 and counts Exchange nodes in both
executed plans: the claim to evidence is wall growth ~linear in rows (not
pairs — ratio well under ~20x for a 10x row scale on iterative/banded
operators) and ZERO new Exchanges at the larger scale.

Writes BENCH_SF1_SHAPE.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1.0-synth"
QUERIES = [
    "minhash_lsh_pairs",
    "dedup_clusters",
    "semantic_dedup_clusters",
    "ann_topk_ivf_batch",
    "dsir_select",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(10).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    words = F.split(F.col("text"), " ")
    rot = F.concat(
        F.slice(words, F.col("rep") + 1, F.size(words)),
        F.slice(words, 1, F.col("rep")),
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * n_docs).alias("doc_id"),
            F.array_join(rot, " ").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_emb = emb.count()
    vec = F.col("embedding")
    shifted = F.concat(
        F.slice(vec, F.col("rep") + 1, F.size(vec)),
        F.slice(vec, 1, F.col("rep")),
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * n_emb).alias("vec_id"),
            shifted.cast("array<float>").alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/embeddings.parquet")
    )
    # the five queries only read documents/embeddings; link the rest for
    # loader uniformity
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        d = f"{DST}/{t}.parquet"
        if not os.path.exists(d):
            os.symlink(f"{SRC}/{t}.parquet", d)
    open(os.path.join(DST, "_DONE"), "w").close()


def measure(spark, name: str, sf_dir: str) -> tuple[float, int, int]:
    import bench
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    best = float("inf")
    rows = 0
    for _ in range(2):
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = df.count()
        best = min(best, time.time() - t0)
        bench._clear_spark_state(spark)
    return best, rows, n_exchange


def main() -> None:
    import bench

    spark = bench.build_session(bench.CPUS)
    spark.range(1).count()
    build_sf1(spark)
    out = {"queries": {}, "host_pre": bench._host_calibration()}
    for name in QUERIES:
        bench._wait_host_idle(timeout=60)
        s01, r01, x01 = measure(spark, name, SRC)
        bench._wait_host_idle(timeout=60)
        s10, r10, x10 = measure(spark, name, DST)
        out["queries"][name] = {
            "sf01_sec": round(s01, 3),
            "sf1_sec": round(s10, 3),
            "wall_ratio": round(s10 / s01, 2),
            "rows_out_sf01": r01,
            "rows_out_sf1": r10,
            "exchanges_sf01": x01,
            "exchanges_sf1": x10,
            "new_exchanges": x10 - x01,
        }
        print("SF1 " + name + " " + json.dumps(out["queries"][name]), flush=True)
    out["host_post"] = bench._host_calibration()
    out["row_scale"] = 10.0
    with open("/root/repo/BENCH_SF1_SHAPE.json", "w") as f:
        json.dump(out, f, indent=2)
    print("SF1_SHAPE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
