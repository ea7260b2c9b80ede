"""Memory-bandwidth saturation probe: STREAM-style copy at 1/2/4 procs.

The missing physical variable in the scaling evidence: every guest
counter (external CPU, container CPU, loadavg) reads ~0 during storms,
yet 4-executor arms intermittently run ~1.6x their quiet wall while the
1-executor arm barely moves. The only shared resource left below guest
visibility is the PHYSICAL host's memory subsystem (bus + LLC shared
with neighbor tenants). This probe measures it directly:

  - solo: one process copies a >LLC-sized buffer N times → GB/s
  - k-way: k processes do the identical copy simultaneously → per-proc
    and aggregate GB/s

If the box's aggregate bandwidth at 4-way is ~flat vs solo (per-proc =
solo/4 × k ≈ solo), the copy is bus-bound and concurrency divides a
fixed ceiling. If aggregate scales with k, cores have private headroom
and a 1.6x t4 slowdown cannot be OUR concurrency — it's time-varying
external bandwidth theft. Run repeatedly across quiet and stormy
windows to see the ceiling itself move (neighbor-tenant weather).

Usage: python tools/membw_probe.py [reps] [mb_per_proc]
Appends one JSON line per rep to stdout and BENCH_MEMBW.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def copy_gbps(mb: int, inner: int = 8) -> float:
    """One process's achieved copy bandwidth (GB moved / sec, counting
    read+write once each). Buffer is far beyond any LLC, so every pass
    streams DRAM."""
    n = mb * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    b = np.zeros(n, dtype=np.float64)
    b[:] = a  # first-touch both buffers before timing
    t0 = time.perf_counter()
    for _ in range(inner):
        b[:] = a
        a[:] = b
    dt = time.perf_counter() - t0
    gb = 2 * inner * 2 * n * 8 / 1e9  # 2 copies/iter × (rd+wr) × bytes
    return gb / dt


def _worker(mb: int, barrier, q) -> None:
    # warm allocation before the barrier so all procs stream together
    n = mb * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    b = np.zeros(n, dtype=np.float64)
    b[:] = a
    barrier.wait()
    t0 = time.perf_counter()
    inner = 8
    for _ in range(inner):
        b[:] = a
        a[:] = b
    dt = time.perf_counter() - t0
    q.put(2 * inner * 2 * n * 8 / 1e9 / dt)


def kway(k: int, mb: int) -> list[float]:
    barrier = mp.Barrier(k)
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(mb, barrier, q)) for _ in range(k)
    ]
    for p in procs:
        p.start()
    out = [q.get() for _ in range(k)]
    for p in procs:
        p.join()
    return sorted(out)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    recs = []
    for r in range(reps):
        solo = copy_gbps(mb)
        two = kway(2, mb)
        four = kway(4, mb)
        rec = {
            "rep": r,
            "mb_per_proc": mb,
            "solo_gbps": round(solo, 2),
            "two_per_proc_gbps": [round(v, 2) for v in two],
            "four_per_proc_gbps": [round(v, 2) for v in four],
            "agg_two": round(sum(two), 2),
            "agg_four": round(sum(four), 2),
            "agg_four_over_solo": round(sum(four) / solo, 3),
        }
        recs.append(rec)
        print(json.dumps(rec), flush=True)
    path = os.path.join(REPO, "BENCH_MEMBW.json")
    old = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f).get("reps", [])
        except (OSError, ValueError):
            old = []
    allr = old + recs
    with open(path, "w") as f:
        json.dump(
            {
                "harness": (
                    "tools/membw_probe.py — STREAM-style float64 copy, "
                    "1 GiB/proc, read+write counted; k procs released "
                    "together by a barrier"
                ),
                "reps": allr,
                "median_agg_four_over_solo": sorted(
                    r["agg_four_over_solo"] for r in allr
                )[len(allr) // 2],
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
