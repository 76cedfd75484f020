"""Scaling-efficiency evidence: the same maintenance job (merge -> compact
-> Z-order cluster) at two parallelism levels on identical input.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; this sandbox has no real cluster, so parallelism levels are
local[N] vs local[4N] cores (same JVM memory, same input, same physical
plan — the bin layout is derived from live bytes, not core count).

Protocol (noise-robust on a shared-host VM):
  1. Build the base images table ONCE (80% small files) and stage the CDC
     batch once — Python fixture generation is excluded from all timings.
  2. Back up the pristine table directory.
  3. For each (cores, rep): restore the backup to the SAME path (manifests
     carry absolute paths), run tools/maint_once.py in a fresh JVM, parse
     its JSON line.
  4. Per level take the per-op MIN across reps (the standard estimator when
     individual runs can be inflated by CPU steal); efficiency =
     (T_N / T_4N) / (4N / N).

Usage: python tools/bench_scaling.py [n_images] [small_cores] [big_cores] [reps]
Writes the report to scaling_result.json (consumed by BENCH.md / BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_ROOT = "/tmp/moonlink_scaling_tbl"
BACKUP_ROOT = "/tmp/moonlink_scaling_base"
CHANGES = "/tmp/moonlink_scaling_changes"
STAMP = os.path.join(BACKUP_ROOT, "_fixture.json")


def build_fixture(n_images: int, gen_cores: int = 32) -> None:
    stamp = {"n_images": n_images}
    if os.path.exists(STAMP):
        with open(STAMP) as f:
            if json.load(f) == stamp and os.path.isdir(CHANGES):
                return
    code = f"""
import sys, shutil
sys.path.insert(0, {REPO!r})
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


def run_once(cores: int) -> dict:
    shutil.rmtree(RUN_ROOT, ignore_errors=True)
    shutil.copytree(BACKUP_ROOT, RUN_ROOT)
    os.remove(os.path.join(RUN_ROOT, "_fixture.json"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "maint_once.py"),
         RUN_ROOT, CHANGES, str(cores)],
        capture_output=True, text=True, timeout=3000, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run(cores: int, reps: int) -> dict:
    runs = [run_once(cores) for _ in range(reps)]
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
    build_fixture(n_images)
    print(f"fixture ready in {time.time() - t0:.0f}s", file=sys.stderr)

    r_small = run(small, reps)
    r_big = run(big, reps)

    t_s, t_b = r_small["maint_sec"], r_big["maint_sec"]
    speedup = t_s / t_b
    eff = speedup / (big / small)
    report = {
        "n_images": n_images,
        "reps": reps,
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
        "full_small": r_small,
        "full_big": r_big,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
