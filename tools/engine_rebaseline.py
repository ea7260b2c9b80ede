"""Round-5 task 1: re-baseline engine_waves under calibration discipline.

Runs the engine-wave bench FIRST in a fresh JVM (nothing else fragments
memory), host fingerprint immediately before and after the bench alone,
best-of-3 with idle gates between runs, and emits one JSON line with a
fingerprint-normalized wall (wall * memcpy_gbps / 19.0 — 19 GB/s is the
r3 reference-day bandwidth recorded in BENCH_MEMBW.json).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    bench._wait_host_idle(timeout=90)
    pre = bench._host_calibration()
    spark = bench.build_session(bench.CPUS)
    spark.range(1).count()
    runs = []
    urls = 0
    for i in range(3):
        if i:
            bench._wait_host_idle(timeout=90)
        t0 = time.time()
        dt, urls = bench.bench_engine_waves(spark)
        runs.append(round(dt, 3))
        bench._clear_spark_state(spark)
    post = bench._host_calibration()
    best = min(runs)
    memcpy = max(pre["memcpy_gbps"], post["memcpy_gbps"])
    out = {
        "engine_waves_runs": runs,
        "engine_waves_best": best,
        "engine_urls": urls,
        "engine_urls_per_sec": round(urls / best, 1),
        "host_pre": pre,
        "host_post": post,
        "engine_waves_normalized_19gbps": round(best * memcpy / 19.0, 3),
        "note": "fresh JVM, engine bench first, best-of-3, idle-gated",
    }
    print("ENGINE_REBASELINE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
