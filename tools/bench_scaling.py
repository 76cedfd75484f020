"""Scaling-efficiency evidence: the same maintenance job (merge -> compact
-> Z-order cluster -> expire) at two parallelism levels on identical input.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; this sandbox has no real cluster, so parallelism levels are
local[N] vs local[4N] cores (same JVM memory, same input, same job plan —
the bin layout is derived from live bytes, not core count).

Usage: python tools/bench_scaling.py [n_images] [small_cores] [big_cores]
Writes results to stdout and appends a markdown table row set to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, n_images: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cores),
        "BENCH_N_IMAGES": str(n_images),
        "BENCH_MAINT_ONLY": "1",
        "SPARK_GRAFT_SF_DIR": env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    r_small = run(small, n_images)
    r_big = run(big, n_images)

    def maint(r):
        return r["queries"]["compact"] + r["queries"]["cluster_zorder"]

    t_s, t_b = maint(r_small), maint(r_big)
    speedup = t_s / t_b
    eff = speedup / (big / small)
    report = {
        "n_images": n_images,
        "cores_small": small,
        "cores_big": big,
        "maint_sec_small": round(t_s, 3),
        "maint_sec_big": round(t_b, 3),
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
