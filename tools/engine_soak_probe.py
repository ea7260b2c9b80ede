"""Round-5 task 1b: engine_waves warm asymptote. Six consecutive runs in one
JVM with a membw fingerprint before each — separates JIT/page-cache warm-up
and storm windows from any real per-run floor."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    spark = bench.build_session(bench.CPUS)
    spark.range(1).count()
    out = []
    for i in range(6):
        bw = bench._membw_now()
        t0 = time.time()
        dt, urls = bench.bench_engine_waves(spark)
        out.append({"run": i, "membw_gbps": round(bw, 1), "sec": round(dt, 3)})
        print("RUN " + json.dumps(out[-1]), flush=True)
        bench._clear_spark_state(spark)
    print("ENGINE_SOAK " + json.dumps({"runs": out, "urls": urls}), flush=True)


if __name__ == "__main__":
    main()
