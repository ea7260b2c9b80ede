"""Paired executor-model scaling measurement (the north-rule evidence).

Protocol (what two weeks of noisy-host fighting distilled to):

- The analog of "N vs 4N executors" in this sandbox is 1 vs 4 independent
  ``local[4]`` JVMs, each running bench.py's frontier-admission job over its
  own identical input slice (``--child-once``).
- This VM's failure modes, each diagnosed and controlled for:
  * lingering pyspark JVMs from prior runs burn cores invisibly →
    children call spark.stop() AND the harness waits for /proc/stat
    total-busy < 1 core (NOT loadavg) before every timed run;
  * intermittently ~100× slow first-touch page faults (reclaim/compaction
    storms after large frees) make allocation-heavy JVMs degrade and
    interfere → -Xms=-Xmx -XX:+AlwaysPreTouch moves all heap faulting to
    the untimed JVM startup (SPARK_GRAFT_JVM_PRETOUCH), and
    /proc/sys/vm/compact_memory is poked between runs;
  * each JVM sizes GC/JIT pools for all 32 visible cores →
    -XX:ActiveProcessorCount=4 (SPARK_GRAFT_JVM_PROCS);
  * host conditions drift monotonically over hours → efficiency is taken
    from ADJACENT (t1, t4) pairs, never from minima collected hours apart.
- each idle-gated WINDOW runs the arms interleaved back-to-back
  (t1 → t4 → t1) and yields two readings: eff_batch = t1/max(t4) (fixed
  batch, straggler-punished) and eff_tput = mean(t1/t4_i) (aggregate
  throughput ratio — the north rule's literal quantity); the headline
  number is the MEDIAN over ≥10 windows, with best-window kept alongside.

Writes BENCH_SCALING_EXECUTORS.json. Run on an otherwise idle box:

    python tools/scaling_exec_paired.py [windows] [scaling_n]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# single source of truth for host gating — bench.py owns the /proc/stat
# busy formula and the compact_memory settle; importing keeps the bench
# gate and the scaling windows from silently diverging
from bench import _container_cpu_sec  # noqa: E402
from bench import settle as _settle  # noqa: E402
from bench import total_busy, wait_idle  # noqa: E402,F401

sys.path.insert(0, os.path.join(REPO, "tools"))
from membw_probe import copy_gbps, kway  # noqa: E402


ESTIMATOR = "sandwich-interleaved-barrier"


def _membw() -> float:
    """Spot-read the box's achieved single-stream copy bandwidth (GB/s).

    The one shared resource no guest CPU counter can see: the physical
    host's memory subsystem. External CPU telemetry reads ~0 during some
    storms, yet t4 arms intermittently run ~1.6x their quiet wall — the
    signature of neighbor tenants consuming bus/LLC bandwidth invisible
    to this VM. A 512 MiB single-proc copy takes ~0.5 s and reads the
    bandwidth actually available at that instant; bracketing every arm
    with it turns 'invisible weather' into a recorded, gateable number."""
    return round(copy_gbps(256, inner=4), 2)


def _membw_k(k: int) -> list[float]:
    """k-way concurrent copy, per-proc GB/s (sorted ascending). The
    single-stream read can stay healthy while the k-way envelope
    collapses: one stream demands ~17 GB/s, sixteen demand ~173 GB/s
    quiet — a neighbor-tenant load that only shaves the top of the
    physical bus is invisible to the single-stream probe yet taxes every
    core of a 16-core arm. Window 0 of the round-4 collection showed
    exactly that (boundary single-stream 15.4-18.2 GB/s, external CPU
    0.0, yet 2.3x CPU-seconds inflation inside the t4 arm), so the t4
    arm is additionally bracketed with a probe at ITS concurrency."""
    return [round(v, 2) for v in kway(k, 256)]


def _host_busy_sec() -> float:
    """Cumulative host-wide busy CPU-seconds (same /proc/stat fields as
    bench.total_busy: user nice system irq softirq steal). Sampled at arm
    boundaries, (Δbusy/wall − our container's cpu/wall) is the EXTERNAL
    load that ran during the arm — the per-window interference telemetry
    the pathology report needs."""
    v = list(map(int, open("/proc/stat").readline().split()[1:9]))
    return (v[0] + v[1] + v[2] + v[5] + v[6] + v[7]) / 100.0


def settle() -> None:
    _settle()
    time.sleep(5)


def run(n: int, scaling_n: int, cores: int = 4) -> tuple:
    # start barrier: every child finishes JVM launch (heap pretouch),
    # codegen/python-worker warmup, and input materialization, THEN all
    # timed runs are released together onto a just-settled host. Without
    # it the quartet's fastest-starting child times its job against
    # siblings still faulting 6 GB heaps in — an overhead only the t4 arm
    # pays (the lone child has no siblings), biasing efficiency down.
    barrier = tempfile.mkdtemp(prefix="sbarrier_")
    procs = []
    for i in range(n):
        env = {
            **os.environ,
            "SPARK_GRAFT_CPUS": str(cores),
            "BENCH_DRIVER_MEM": "6g",
            "SPARK_LOCAL_DIRS": f"/dev/shm/sbench{i}",
            "SPARK_GRAFT_JVM_PRETOUCH": "1",
            "SPARK_GRAFT_JVM_PROCS": str(cores),
            "BENCH_SCALING_N": str(scaling_n),
            "BENCH_BARRIER": barrier,
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, "bench.py", "--child-once", str(cores)],
                stdout=subprocess.PIPE, text=True, cwd=REPO, env=env,
            )
        )
    deadline = time.time() + 600
    while time.time() < deadline:
        ready = [f for f in os.listdir(barrier) if f.startswith("ready.")]
        if len(ready) >= n or any(p.poll() is not None for p in procs):
            break  # all warmed (or a child died — release and let it report)
        time.sleep(0.2)
    _settle()  # absorb the warmup's own page-fault wake before timing
    c0 = _container_cpu_sec()
    h0 = _host_busy_sec()
    t0 = time.time()
    with open(os.path.join(barrier, "go"), "w"):
        pass
    secs = []
    for p in procs:
        # per-arm watchdog: a wedged child (observed once: a 1-task stage
        # parked at zero CPU forever — a pyspark worker-handshake hang)
        # must not wait the whole harness; the arm is abandoned and the
        # window invalidated by the len(secs) check downstream
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            print(json.dumps({"arm_child_timeout": p.pid}), flush=True)
        for line in out.splitlines():
            if line.startswith("ONCE_RESULT "):
                secs.append(json.loads(line[len("ONCE_RESULT "):])["sec"])
    c1 = _container_cpu_sec()
    h1 = _host_busy_sec()
    wall = time.time() - t0
    shutil.rmtree(barrier, ignore_errors=True)
    # arm-level container CPU-seconds across the timed section (only this
    # arm's processes live in the container — external host load does NOT
    # bill here). Diagnostic, not part of the estimator: if the t4 arm's
    # cpu_sec/wall is far below its 16 allocated cores, the children are
    # STALLED (memory/reclaim waits), not burning 4× CPU — the signature
    # that separates host pathology from real contention in the report.
    cpu = round(c1 - c0, 1) if c0 is not None and c1 is not None else None
    # external interference during the arm: host-wide busy cores minus our
    # own container's CPU rate over the identical span
    ext = (
        round(max(0.0, (h1 - h0) - (c1 - c0)) / wall, 2)
        if cpu is not None and wall > 0 else None
    )
    return secs, cpu, round(wall, 3), ext


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    scaling_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    # executor width. The default (4-core executors → 16 streaming cores in
    # the 4-executor arm) oversubscribes this single box's per-core DRAM
    # bandwidth (tools/membw_probe.py: ~0.62x solo per core at 16-way);
    # exec_cores=1 keeps the 4-executor arm at 4 streaming cores — the
    # probe-verified flat-bandwidth region — so it measures the ENGINE's
    # N→4N scaling with the shared-bus artifact removed (a real 4-node
    # cluster has 4 separate memory subsystems). Results land in separate
    # files; the two populations are never pooled.
    exec_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    new_windows = []
    for w in range(windows):
        # One WINDOW = one idle-gated sequence of interleaved arms run
        # back-to-back (t1 → t4 → t1, the sandwich): the plain adjacent
        # pair assumes conditions are stationary across its two runs, and
        # the host broke that both ways (pair_eff 0.26 when the storm hit
        # t4, 1.47 when it hit t1). Bracketing t4 with two t1 measurements
        # bounds the estimate by the quieter neighboring single-executor
        # window. The gate runs ONCE per window — re-gating between arms
        # would let conditions drift inside the pair, which is exactly what
        # the window is supposed to hold fixed.
        settle()
        if not wait_idle(timeout=300):
            print(json.dumps({"window": w, "skipped": "host never idle"}),
                  flush=True)
            continue
        bw0 = _membw()
        s1a, cpu1a, wall1a, ext1a = run(1, scaling_n, exec_cores)
        bw1 = _membw()
        k4 = 4 * exec_cores  # the t4 arm's streaming-core count
        bwk_pre = _membw_k(k4)
        s4, cpu4, wall4, ext4 = run(4, scaling_n, exec_cores)
        bwk_post = _membw_k(k4)
        bw2 = _membw()
        s1b, cpu1b, wall1b, ext1b = run(1, scaling_n, exec_cores)
        bw3 = _membw()
        if s1a and s1b and len(s4) == 4:
            t1 = min(min(s1a), min(s1b))
            # two efficiency readings per window:
            # - eff_batch: t1 / max(t4) — time until ALL four finish a fixed
            #   batch; punished by a single stalled straggler (max of 4
            #   samples vs min of 2 — asymmetric under symmetric noise);
            # - eff_tput: sum_i(t1/t4_i)/4 — ratio of aggregate throughput
            #   (sum of per-executor rates, executors stream independent
            #   slices) to 4x the single-executor rate. This is the north
            #   rule's literal quantity ("throughput scaling efficiency").
            # bracket_drift: disagreement between the window's two t1
            # measurements of the SAME arm — the stationarity the paired
            # estimator assumes. Computed from t1 alone (never from the
            # efficiency value or its direction), so gating on it filters
            # invalid measurements, not unfavorable ones: when the two
            # brackets disagree 2x, no ratio taken inside that window
            # means anything.
            b1, b2 = min(s1a), min(s1b)
            new_windows.append(
                {
                    "window": w,
                    "estimator": ESTIMATOR,
                    "t1": t1,
                    "t1_brackets": [b1, b2],
                    "bracket_drift": round(abs(b1 - b2) / min(b1, b2), 3),
                    "t4": max(s4),
                    "per_exec": s4,
                    "eff_batch": round(t1 / max(s4), 3),
                    "eff_tput": round(sum(t1 / t for t in s4) / 4, 3),
                    # diagnostic telemetry (see run()): container CPU-sec
                    # and harness wall per arm — t4 utilization =
                    # cpu/(16*wall) vs t1's cpu/(4*wall)
                    "arm_cpu_sec": {"t1a": cpu1a, "t4": cpu4, "t1b": cpu1b},
                    "arm_walls": {"t1a": wall1a, "t4": wall4, "t1b": wall1b},
                    # host-wide busy cores MINUS ours, averaged over each
                    # arm — direct per-window evidence of external load
                    "arm_external_cores": {
                        "t1a": ext1a, "t4": ext4, "t1b": ext1b
                    },
                    # single-stream copy GB/s spot-read at the four arm
                    # boundaries — the memory-subsystem weather no guest
                    # CPU counter records (see _membw)
                    "membw_gbps": [bw0, bw1, bw2, bw3],
                    # k-way probe (k = t4 arm's core count) right before
                    # and after the t4 arm: per-core GB/s under the SAME
                    # concurrent demand the arm generates (see _membw_k)
                    "membw_k": k4,
                    "membw_k_pre": bwk_pre,
                    "membw_k_post": bwk_post,
                    "membw_k_agg": [
                        round(sum(bwk_pre), 1), round(sum(bwk_post), 1)
                    ],
                    # bandwidth-model prediction for this window: if the
                    # job were purely DRAM-bound, eff_tput would equal
                    # per-core bandwidth at the t4 arm's concurrency over
                    # the single-stream bandwidth (t1's 4 cores sit in the
                    # probe-verified flat region). Diagnostic only — its
                    # agreement/disagreement with eff_tput attributes the
                    # window's loss to the memory subsystem or not.
                    "eff_bw_pred": round(
                        (sum(bwk_pre) + sum(bwk_post))
                        / (2 * k4)
                        / (sum([bw0, bw1, bw2, bw3]) / 4),
                        3,
                    ),
                }
            )
            print(json.dumps(new_windows[-1]), flush=True)
    path = os.path.join(
        REPO,
        "BENCH_SCALING_EXECUTORS.json" if exec_cores == 4
        else f"BENCH_SCALING_EXECUTORS_C{exec_cores}.json",
    )
    old = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
        except (OSError, ValueError):
            old = {}
    # windows from prior sessions remain valid evidence ONLY if they used
    # this estimator at this work size — every summary statistic below is
    # computed over exactly this one set (round-3 ADVICE: mixed-population
    # summaries are not comparable). The start barrier changed what a
    # window measures (it removed a t4-only startup-overlap bias), so
    # barrier windows carry their own estimator tag and pre-barrier
    # windows are preserved separately, never pooled.
    old_windows = [
        p for p in old.get("windows", [])
        if p.get("estimator") == ESTIMATOR
        and old.get("n_per_exec") == scaling_n
    ]
    prior_estimators = [
        p for p in old.get("windows", [])
        + old.get("windows_prior_estimators", [])
        if p.get("estimator") != ESTIMATOR
    ]
    all_windows = old_windows + new_windows
    legacy = old.get("pairs_legacy", old.get("pairs", []))
    if all_windows:
        effs_b = [p["eff_batch"] for p in all_windows]
        effs_t = [p["eff_tput"] for p in all_windows]
        # stationary subset: windows whose two t1 brackets agree within
        # 25% — the pre-declared validity gate (see bracket_drift comment
        # above; drift is derived only from repeated measurements of the
        # one-executor arm, so the gate cannot see which way the window's
        # efficiency points)
        stationary = [
            p for p in all_windows
            if abs(p["t1_brackets"][0] - p["t1_brackets"][1])
            / min(p["t1_brackets"]) <= 0.25
        ]
        # second validity gate, also computed from the one-executor arm
        # alone: a STEADY external storm inflates both t1 brackets equally
        # (drift can't see it) yet still taxes the 16-core arm far more
        # than the 4-core arm. t1 is the identical job in every window, so
        # its quiet-host wall is a known constant — a window whose t1 runs
        # >20% over the observed floor measured a loaded host, and no
        # ratio taken inside it says anything about the CODE's scaling.
        # Like bracket_drift, the gate never looks at t4 or the efficiency
        # value, so it filters invalid windows, not unfavorable ones.
        t1_floor = min(p["t1"] for p in all_windows)
        quiet = [p for p in stationary if p["t1"] <= 1.2 * t1_floor]
        # third (direct) validity gate: the recorded external load itself.
        # wait_idle() asserts <1 busy core at window START; this asserts
        # the same condition held across every arm's whole timed span,
        # measured as host-busy minus our container's CPU. Only windows
        # recorded after the telemetry landed carry the field.
        ext_idle = [
            p for p in all_windows
            if p.get("arm_external_cores")
            and all(
                v is not None and v <= 1.0
                for v in p["arm_external_cores"].values()
            )
        ]
        # fourth validity gate: the memory-subsystem weather itself. Every
        # boundary spot-read in a valid window must be within 20% of the
        # best bandwidth this box has ever shown — readings below that
        # mean neighbor tenants were consuming the physical host's bus
        # during (or right beside) a timed arm, and the window measured
        # THEIR load, not our code's scaling. Like the other gates it is
        # computed without looking at t4 or the efficiency value.
        bw_all = [b for p in all_windows for b in p.get("membw_gbps", [])]
        bw_peak = max(bw_all) if bw_all else None
        bw_ok = [
            p for p in all_windows
            if p.get("membw_gbps")
            and min(p["membw_gbps"]) >= 0.8 * bw_peak
        ]
        report = {
            "mode": "executor-model-paired",
            "exec_cores": exec_cores,
            "fanout": 4,
            "n_per_exec": scaling_n,
            "harness": (
                "tools/scaling_exec_paired.py (idle-gated interleaved "
                "windows, heap-pretouch, explicit spark.stop, sandwich "
                "estimator t1->t4->t1 per window, start barrier: all "
                "children warm JVM+codegen+python workers then release "
                "timed runs together)"
            ),
            "windows": all_windows,
            "n_windows": len(all_windows),
            "median_eff_tput": round(_median(effs_t), 3),
            "median_eff_batch": round(_median(effs_b), 3),
            "stationarity_gate": "t1-bracket drift <= 0.25",
            "n_windows_stationary": len(stationary),
            "median_eff_tput_stationary": (
                round(_median([p["eff_tput"] for p in stationary]), 3)
                if stationary else None
            ),
            "median_eff_batch_stationary": (
                round(_median([p["eff_batch"] for p in stationary]), 3)
                if stationary else None
            ),
            "quiet_gate": (
                "bracket drift <= 0.25 AND t1 <= 1.2 x min(t1) over all "
                "windows (both computed from the one-executor arm only)"
            ),
            "t1_floor": t1_floor,
            "n_windows_quiet": len(quiet),
            "median_eff_tput_quiet": (
                round(_median([p["eff_tput"] for p in quiet]), 3)
                if quiet else None
            ),
            "median_eff_batch_quiet": (
                round(_median([p["eff_batch"] for p in quiet]), 3)
                if quiet else None
            ),
            "ext_idle_gate": (
                "measured external load <= 1.0 busy core during every arm "
                "(wait_idle's start-of-window criterion, held across the "
                "window; from arm_external_cores telemetry)"
            ),
            "n_windows_ext_idle": len(ext_idle),
            "median_eff_tput_ext_idle": (
                round(_median([p["eff_tput"] for p in ext_idle]), 3)
                if ext_idle else None
            ),
            "median_eff_batch_ext_idle": (
                round(_median([p["eff_batch"] for p in ext_idle]), 3)
                if ext_idle else None
            ),
            "membw_gate": (
                "all four arm-boundary single-stream copy spot-reads >= "
                "0.8 x the best reading ever observed on this box "
                "(memory-subsystem weather; computed from the probe "
                "alone, never from t4 or the efficiency)"
            ),
            "membw_peak_gbps": bw_peak,
            "n_windows_membw": len(bw_ok),
            "median_eff_tput_membw": (
                round(_median([p["eff_tput"] for p in bw_ok]), 3)
                if bw_ok else None
            ),
            "median_eff_batch_membw": (
                round(_median([p["eff_batch"] for p in bw_ok]), 3)
                if bw_ok else None
            ),
            "best_eff_tput": max(effs_t),
            "best_eff_batch": max(effs_b),
            "agg_urls_per_sec_4exec_best": round(
                max(sum(scaling_n / t for t in p["per_exec"])
                    for p in all_windows), 1
            ),
            "windows_prior_estimators": prior_estimators,
            "pairs_legacy": legacy,
            "uncontrolled_residual": (
                "host page-fault/reclaim stalls vary 3x hour-to-hour; "
                "see BENCH_SCALING.md diagnosis"
            ),
        }
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: v for k, v in report.items()
                          if k not in ("windows", "pairs_legacy")}))
    for i in range(4):
        shutil.rmtree(f"/dev/shm/sbench{i}", ignore_errors=True)


if __name__ == "__main__":
    main()
