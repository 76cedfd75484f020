"""Run ONE maintenance cycle (merge -> fused compact+Z-order-cluster) on a
pre-built images table at a given parallelism level; print one JSON line.

Used by bench_scaling.py: the parent restores a pristine copy of the table
before each invocation, so every run does identical work on identical input
— only the core count changes.

Usage: python tools/maint_once.py <table_root> <changes_parquet> <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_cpu_sec() -> float:
    """CPU-seconds consumed so far by THIS process's whole subtree — the
    python driver, the gateway JVM, and the pyspark worker daemons — live
    processes via /proc utime+stime plus each node's reaped-children
    cutime+cstime. bench_scaling.py subtracts this self-report from the
    VM's total busy CPU to see CPU burned by OTHER processes (os.times()
    in the parent can't see the JVM: pyspark kills it without waiting, so
    its usage never rolls into the children counters)."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        # post-comm fields: 0 state, 1 ppid, ... 11 utime, 12 stime,
        # 13 cutime, 14 cstime
        procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12])
                         + int(rest[13]) + int(rest[14]))
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in procs:
            total += procs[p][1]
        stack.extend(children.get(p, []))
    return total / clk


def main() -> None:
    root, changes_path, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])

    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.operators.optimize import optimize
    from moonlink_spark.session import get_spark
    from moonlink_spark.table import MoonTable

    spark = get_spark("maint_once", cores=cores)
    table = MoonTable.load(spark, root)
    live = sum(f.file_size_bytes for f in table.data_files())
    # fixed bin layout derived from input bytes, NOT core count: both
    # parallelism levels run the identical physical plan
    target = max(4 * 1024 * 1024, live // 128)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    changes = spark.read.parquet(changes_path)
    timed("merge_cdc", lambda: merge_into(table, changes, run_id="sm1"))
    # the FUSED compact+cluster: one full rewrite that bin-packs, applies
    # DVs inline, and Z-orders — the headline maintenance op
    timed("compact_cluster_fused", lambda: optimize(
        table, mode="full", cluster_by=["phash", "w", "h"], run_id="sf1",
        target_bytes=target))

    rows = table.scan().count()
    maint = timings["compact_cluster_fused"]
    # stage split recorded by the cluster operator's lineage metrics:
    # plan (serial driver work) vs rewrite (the parallel shuffle+write)
    stages = {}
    mpath = os.path.join(root, "metadata", "lineage", "sf1", "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            stages = json.load(f).get("stage_seconds", {})
    print(json.dumps({
        "cores": cores,
        "queries": timings,
        "fused_stage_seconds": stages,
        "live_bytes": live,
        "rows": rows,
        "maint_sec": round(maint, 3),
        "maint_gb_per_s": round(live / max(maint, 1e-9) / 1e9, 4),
        "maint_images_per_s": round(rows / max(maint, 1e-9), 1),
        "rep_cpu_sec": round(tree_cpu_sec(), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
