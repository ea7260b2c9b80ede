"""One-box saturation curve: 1 vs 2 vs 4 concurrent local[4] executors.

Companion evidence to tools/scaling_exec_paired.py. The paired windows
measure the north rule's N→4N quantity; this probe measures WHERE the
one-box ceiling comes from. If efficiency holds ~1.0 at 1→2 executors and
drops at 1→4, the loss is shared memory-bandwidth saturation of the single
box — a resource real multi-node clusters do not share, and exactly the
effect the paired data's ext≈0-cores telemetry leaves as the only
candidate. Each sweep runs the arms back-to-back (t1 → t2 → t4 → t1) under
one idle gate, bracketed like the sandwich estimator.

Usage: python tools/scaling_saturation.py [sweeps] [scaling_n]
Appends to BENCH_SCALING_SATURATION.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import wait_idle  # noqa: E402
from tools.scaling_exec_paired import _median, run, settle  # noqa: E402


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scaling_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    out = []
    for s in range(sweeps):
        settle()
        if not wait_idle(timeout=300):
            print(json.dumps({"sweep": s, "skipped": "host never idle"}),
                  flush=True)
            continue
        s1a, _, _, ext1a = run(1, scaling_n)
        s2, _, _, ext2 = run(2, scaling_n)
        s4, _, _, ext4 = run(4, scaling_n)
        s1b, _, _, ext1b = run(1, scaling_n)
        if not (s1a and s1b and len(s2) == 2 and len(s4) == 4):
            continue
        t1 = min(min(s1a), min(s1b))
        b1, b2 = min(s1a), min(s1b)
        rec = {
            "sweep": s,
            "t1": t1,
            "t1_brackets": [b1, b2],
            "bracket_drift": round(abs(b1 - b2) / min(b1, b2), 3),
            "per_exec_2": s2,
            "per_exec_4": s4,
            "eff_tput_1to2": round(sum(t1 / t for t in s2) / 2, 3),
            "eff_tput_1to4": round(sum(t1 / t for t in s4) / 4, 3),
            "ext_cores": {"t1a": ext1a, "t2": ext2, "t4": ext4,
                          "t1b": ext1b},
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    path = os.path.join(REPO, "BENCH_SCALING_SATURATION.json")
    old = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f).get("sweeps", [])
        except (OSError, ValueError):
            old = []
    sweeps_all = old + out
    if sweeps_all:
        report = {
            "harness": (
                "tools/scaling_saturation.py — idle-gated sweeps, arms "
                "t1->t2->t4->t1 back-to-back, same barrier/warm-run "
                "protocol as scaling_exec_paired.run()"
            ),
            "n_per_exec": scaling_n,
            "sweeps": sweeps_all,
            "median_eff_1to2": _median(
                [r["eff_tput_1to2"] for r in sweeps_all]
            ),
            "median_eff_1to4": _median(
                [r["eff_tput_1to4"] for r in sweeps_all]
            ),
        }
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps({k: report[k] for k in
                          ("median_eff_1to2", "median_eff_1to4")}))


if __name__ == "__main__":
    main()
