"""Scaling-efficiency evidence: the same maintenance job (merge -> compact
-> Z-order cluster) at two parallelism levels on identical input.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; this sandbox has no real cluster, so parallelism levels are
local[N] vs local[4N] cores (same JVM memory, same input, same physical
plan — the bin layout is derived from live bytes, not core count).

Protocol (noise-robust on a shared-host VM with measurable CPU steal):
  1. Build the base images table ONCE (80% small files) and stage the CDC
     batch once — Python fixture generation is excluded from all timings.
  2. Back up the pristine table directory.
  3. For each rep: restore the backup to the SAME path (manifests carry
     absolute paths), run tools/maint_once.py in a fresh JVM, parse its
     JSON line. Reps ALTERNATE between the two core levels so host drift
     hits both levels symmetrically.
  4. Interference rejection, two independent signals sampled around each
     rep's JVM: (a) /proc/stat steal — average stolen cores above
     STEAL_MAX (default 0.25, env MOONLINK_STEAL_MAX) means the
     hypervisor gave our vCPUs to a neighbour VM; (b) other-process CPU —
     VM busy CPU minus the rep tree's own os.times() usage, above
     OTHER_CPU_MAX (default 0.5, env MOONLINK_OTHER_CPU_MAX) means some
     other in-VM process competed for the cores. Either way the rep is
     logged and REJECTED — it measures the interference, not this code.
     Rep attempts continue until each level has `reps` accepted runs
     (or 6x attempts cap).
  5. Per level take the per-op MIN across accepted reps (the standard
     estimator when individual runs can only be inflated by interference);
     efficiency = (T_N / T_4N) / (4N / N).

Usage: python tools/bench_scaling.py [n_images] [small_cores] [big_cores] [reps]
Writes the report to scaling_result.json and appends one line to
scaling_history.jsonl (consumed by BENCH.md / BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE_SNAP = "/tmp/moonlink_scaling_code"
RUN_ROOT = "/tmp/moonlink_scaling_tbl"
BACKUP_ROOT = "/tmp/moonlink_scaling_base"
CHANGES = "/tmp/moonlink_scaling_changes"
STAMP = os.path.join(BACKUP_ROOT, "_fixture.json")
CLK_TCK = os.sysconf("SC_CLK_TCK")
STEAL_MAX = float(os.environ.get("MOONLINK_STEAL_MAX", "0.25"))  # avg stolen cores
# avg CPU cores burned by OTHER in-VM processes during a rep (non-steal
# contention the steal counter can't see)
OTHER_CPU_MAX = float(os.environ.get("MOONLINK_OTHER_CPU_MAX", "0.5"))
ATTEMPT_CAP_MULT = 6


def snapshot_code() -> None:
    """Freeze the code under test so repo edits can't drift mid-batch.

    Every rep runs maint_once.py from this snapshot, so all reps in a batch
    (and the fixture they share) execute byte-identical code even while the
    working tree is being edited between batches.
    """
    shutil.rmtree(CODE_SNAP, ignore_errors=True)
    os.makedirs(os.path.join(CODE_SNAP, "tools"))
    shutil.copytree(os.path.join(REPO, "moonlink_spark"),
                    os.path.join(CODE_SNAP, "moonlink_spark"),
                    ignore=shutil.ignore_patterns("__pycache__"))
    shutil.copy2(os.path.join(REPO, "tools", "maint_once.py"),
                 os.path.join(CODE_SNAP, "tools", "maint_once.py"))


def read_steal_sec() -> float:
    """Cumulative CPU-seconds stolen by the hypervisor (whole VM)."""
    with open("/proc/stat") as f:
        fields = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    return int(fields[8]) / CLK_TCK if len(fields) > 8 else 0.0


def build_fixture(n_images: int, gen_cores: int = 32) -> None:
    stamp = {"n_images": n_images}
    if os.path.exists(STAMP):
        with open(STAMP) as f:
            if json.load(f) == stamp and os.path.isdir(CHANGES):
                return
    code = f"""
import sys, shutil
sys.path.insert(0, {CODE_SNAP!r})
from moonlink_spark.session import get_spark
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df
shutil.rmtree({RUN_ROOT!r}, ignore_errors=True)
shutil.rmtree({CHANGES!r}, ignore_errors=True)
spark = get_spark("scal_build", cores={gen_cores})
create_images_table(spark, {RUN_ROOT!r}, {n_images}, seed=42)
generate_changes_df(spark, {n_images}, {n_images // 5}, seed=42).write.parquet({CHANGES!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=3000)
    shutil.rmtree(BACKUP_ROOT, ignore_errors=True)
    shutil.copytree(RUN_ROOT, BACKUP_ROOT)
    with open(STAMP, "w") as f:
        json.dump(stamp, f)


def read_busy_sec() -> float:
    """Cumulative CPU-seconds the whole VM spent busy (user+nice+system)."""
    with open("/proc/stat") as f:
        fields = f.readline().split()
    return (int(fields[1]) + int(fields[2]) + int(fields[3])) / CLK_TCK


def run_once(cores: int) -> tuple[dict, dict]:
    """One rep: restore pristine table, run maintenance, audit interference.

    Two independent rejection signals, either one kills the rep:
      - steal: hypervisor gave our vCPUs to a neighbour VM;
      - other-CPU: busy CPU inside the VM that our rep tree did not burn
        (read_busy_sec delta minus the rep's SELF-REPORTED subtree CPU —
        maint_once walks /proc over python driver + JVM + pyspark workers
        just before exit; the parent's os.times() can't see the JVM
        because pyspark kills it unwaited), i.e. some other in-VM process
        competed for the cores. The rep's own JVM-shutdown ticks after the
        self-report land in "other" — a <0.1-core bias at these walls.
    Returns (job_json, rep_meta) where rep_meta carries the audit.
    """
    shutil.rmtree(RUN_ROOT, ignore_errors=True)
    shutil.copytree(BACKUP_ROOT, RUN_ROOT)
    os.remove(os.path.join(RUN_ROOT, "_fixture.json"))
    steal0 = read_steal_sec()
    busy0 = read_busy_sec()
    load0 = os.getloadavg()[0]
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(CODE_SNAP, "tools", "maint_once.py"),
         RUN_ROOT, CHANGES, str(cores)],
        capture_output=True, text=True, timeout=3000, check=True,
    )
    wall = time.time() - t0
    steal_sec = read_steal_sec() - steal0
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    other_sec = max(0.0, (read_busy_sec() - busy0)
                    - float(result.get("rep_cpu_sec", 0.0)))
    steal_cores = steal_sec / max(wall, 1e-9)
    other_cores = other_sec / max(wall, 1e-9)
    meta = {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "steal_sec": round(steal_sec, 2),
        "steal_cores": round(steal_cores, 3),
        "other_cpu_cores": round(other_cores, 3),
        "loadavg_start": round(load0, 2),
        "maint_sec": round(result["queries"]["compact_cluster_fused"], 3),
        "accepted": steal_cores <= STEAL_MAX and other_cores <= OTHER_CPU_MAX,
    }
    return result, meta


def summarize(runs: list[dict]) -> dict:
    best = dict(runs[0])
    best["queries"] = {q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]}
    maint = best["queries"]["compact_cluster_fused"]
    best["maint_sec"] = round(maint, 3)
    best["maint_gb_per_s"] = round(best["live_bytes"] / max(maint, 1e-9) / 1e9, 4)
    best["maint_images_per_s"] = round(best["rows"] / max(maint, 1e-9), 1)
    best["all_runs_maint_sec"] = [
        round(r["queries"]["compact_cluster_fused"], 3) for r in runs
    ]
    return best


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    t0 = time.time()
    snapshot_code()
    build_fixture(n_images)
    print(f"fixture ready in {time.time() - t0:.0f}s", file=sys.stderr)

    accepted: dict[int, list[dict]] = {small: [], big: []}
    rep_log: list[dict] = []
    attempts = 0
    cap = reps * ATTEMPT_CAP_MULT * 2
    # Alternate levels so slow host drift contaminates both symmetrically.
    while (len(accepted[small]) < reps or len(accepted[big]) < reps) and attempts < cap:
        for cores in (small, big):
            if len(accepted[cores]) >= reps:
                continue
            attempts += 1
            result, meta = run_once(cores)
            rep_log.append(meta)
            tag = "ACCEPT" if meta["accepted"] else "REJECT(interference)"
            print(f"[{tag}] cores={cores} maint={meta['maint_sec']}s "
                  f"steal_cores={meta['steal_cores']} "
                  f"other_cpu_cores={meta['other_cpu_cores']}", file=sys.stderr)
            if meta["accepted"]:
                accepted[cores].append(result)

    if not accepted[small] or not accepted[big]:
        print(json.dumps({"error": "no accepted reps within attempt cap",
                          "rep_log": rep_log}, indent=2))
        sys.exit(2)

    r_small = summarize(accepted[small])
    r_big = summarize(accepted[big])

    t_s, t_b = r_small["maint_sec"], r_big["maint_sec"]
    speedup = t_s / t_b
    eff = speedup / (big / small)
    report = {
        "n_images": n_images,
        "reps_requested": reps,
        "reps_accepted_small": len(accepted[small]),
        "reps_accepted_big": len(accepted[big]),
        "reps_rejected": sum(1 for m in rep_log if not m["accepted"]),
        "steal_max_cores": STEAL_MAX,
        "other_cpu_max_cores": OTHER_CPU_MAX,
        "cores_small": small,
        "cores_big": big,
        "maint_sec_small": t_s,
        "maint_sec_big": t_b,
        "maint_sec_small_all_runs": r_small["all_runs_maint_sec"],
        "maint_sec_big_all_runs": r_big["all_runs_maint_sec"],
        "gbps_small": r_small["maint_gb_per_s"],
        "gbps_big": r_big["maint_gb_per_s"],
        "images_per_s_small": r_small["maint_images_per_s"],
        "images_per_s_big": r_big["maint_images_per_s"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "rep_log": rep_log,
        "full_small": r_small,
        "full_big": r_big,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(REPO, "scaling_history.jsonl"), "a") as f:
        slim = {k: v for k, v in report.items() if k not in ("full_small", "full_big")}
        f.write(json.dumps(slim) + "\n")


if __name__ == "__main__":
    main()
