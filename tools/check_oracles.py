"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark AND its oracle_sql() twin on
DuckDB over the same parquet, then compares row count, column names, and an
order-insensitive value multiset. Usage:

    python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from review_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    return "NULL" if v is None else str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(cpus=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = ok_count and ok_cols and multiset(srows, scols) == multiset(drows, dcols)
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} "
            f"vals_ok={ok_vals} ({time.time()-t0:.1f}s)"
        )
        if not ok_vals and ok_count and ok_cols:
            sm, dm = multiset(srows, scols), multiset(drows, dcols)
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            for a, b in diff:
                print(f"    spark={a}\n    duck ={b}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
