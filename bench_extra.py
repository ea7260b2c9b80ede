"""Round-6 optimization harness (guide §1): per-query noop-sink isolation,
plan dumps, and engine wave tracing. bench.py is FROZEN for measurement;
this file exists so optimization work can time and explain individual
queries without touching it.

Usage:
  python bench_extra.py time <query> [<query>...]   best-of-N noop walls
  python bench_extra.py plans [<query>...]          explain("formatted") dumps
  python bench_extra.py engine                      RCS_TRACE_WAVES wave trace
  python bench_extra.py frontier                    headline pipeline best-of-3
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
PLAN_DIR = os.path.join(os.path.dirname(__file__) or ".", "plans", "r06")


def build_session():
    from review_crawler_spark.session import get_spark

    return get_spark(app_name=f"bench_extra[{CPUS}]", cpus=CPUS,
                     shuffle_partitions=CPUS, driver_memory="48g")


def _clear(spark):
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass


def time_queries(spark, names: list[str]) -> dict:
    import __spark_entry__ as entrymod
    from bench import _wait_host_idle

    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        walls = []
        for i in range(RUNS):
            if i:  # first run warms codegen; gate the runs that can win
                _wait_host_idle(timeout=45)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            _clear(spark)
        sc = spark.sparkContext._jsc.sc()
        j0, s0 = sc.dagScheduler().nextJobId(), sc.dagScheduler().nextStageId()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        jobs = sc.dagScheduler().nextJobId() - j0
        stages = sc.dagScheduler().nextStageId() - s0
        _clear(spark)
        out[name] = {"min": min(walls), "runs": walls, "jobs": jobs,
                     "stages": stages}
        print(f"{name}: min={min(walls)} runs={walls} jobs={jobs} "
              f"stages={stages}", flush=True)
    return out


def dump_plans(spark, names: list[str], suffix: str = "before") -> None:
    import __spark_entry__ as entrymod

    os.makedirs(PLAN_DIR, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", flush=True)
        _clear(spark)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    spark = build_session()
    spark.range(1).count()
    if mode == "time":
        res = time_queries(spark, args)
        print(json.dumps(res))
    elif mode == "plans":
        suffix = "before"
        if args and args[0] in ("before", "after"):
            suffix, args = args[0], args[1:]
        dump_plans(spark, args, suffix)
    elif mode == "engine":
        os.environ["RCS_TRACE_WAVES"] = "1"
        import bench as benchmod

        t0 = time.time()
        dt, urls = benchmod.bench_engine_waves(spark)
        print(f"engine_waves: timed={dt:.2f}s total_with_seed="
              f"{time.time() - t0:.2f}s urls={urls}", flush=True)
    elif mode == "frontier":
        import bench as benchmod

        for _ in range(3):
            dt, n = benchmod.bench_frontier_pipeline(spark, 1_500_000)
            print(f"frontier_pipeline: {dt:.3f}s out={n}", flush=True)
            _clear(spark)
    spark.stop()


if __name__ == "__main__":
    main()
