"""spark-submit entry point: one maintenance cycle over a MoonTable.

The north-rule deployment shape — the engine ships as spark-submit jobs
(cluster config comes from spark-submit / cluster defaults, NOT from code):

    zip -r moonlink_spark.zip moonlink_spark
    spark-submit --py-files moonlink_spark.zip \\
        jobs/maintain.py --table /warehouse/images \\
        [--changes /landing/cdc-batch.parquet] \\
        [--cluster-by phash,w,h --curve zorder] \\
        [--mode full|data|split] [--expire-retain 3] [--run-id batch-42]

Steps (each optional, each an atomic snapshot commit, all idempotent per
run_id so a re-submitted failed job resumes from lineage):
  1. MERGE the staged CDC batch (if --changes)
  2. optimize: mode=full + --cluster-by -> FUSED compact+cluster;
     mode=data -> best-effort compaction; mode=split -> compact then
     cluster; mode=incremental + --cluster-by -> cluster ONLY files not
     yet on the curve (the steady-state daily op)
  3. expire snapshots + sweep orphans (if --expire-retain)
Prints one JSON line of timings + lineage-derived metrics.

--rollback-to SNAPSHOT_ID runs INSTEAD of the steps above: a metadata-only
commit restoring that retained snapshot's exact row set (history kept).

--warehouse ROOT (instead of --table): one policy-driven maintenance sweep
over EVERY table under ROOT — incremental clustering where off-curve
pressure is due, optional expiry + quarantine sweep — the multi-table
background maintenance loop as a single cron'd spark-submit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=None)
    ap.add_argument("--changes", default=None)
    ap.add_argument("--cluster-by", default=None)
    ap.add_argument("--curve", default="zorder",
                choices=["zorder", "hilbert", "align"],
                help="align groups by distinct values of --cluster-by (columns or transform exprs like day(ts)) — the producer op for --export-partition-by")
    ap.add_argument("--mode", default="full",
                    choices=["full", "data", "split", "incremental"])
    ap.add_argument("--expire-retain", type=int, default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--sweep-grace-seconds", type=float, default=3 * 24 * 3600)
    # two-phase reclamation: "quarantine" parks orphans; a later run with
    # --sweep-mode purge empties the quarantine AND deletes fresh orphans
    # directly. Alternate modes (e.g. nightly purge) or quarantine grows
    # forever.
    ap.add_argument("--sweep-mode", default="quarantine",
                    choices=["quarantine", "purge"])
    # restore a retained snapshot's exact row set as a new commit (history
    # preserved); runs INSTEAD of merge/optimize — a rollback followed by
    # maintenance in one invocation would blur which state got maintained
    ap.add_argument("--rollback-to", type=int, default=None)
    # warehouse mode: --warehouse ROOT ignores --table and runs ONE
    # policy-driven maintenance sweep (incremental clustering where due,
    # optional expiry+sweep) over EVERY table under ROOT — the backend
    # multi-table maintenance loop as a single cron'd spark-submit
    ap.add_argument("--warehouse", default=None)
    # after maintenance, export the resulting snapshot as genuine Iceberg
    # v2 metadata under this directory (versioned: each invocation appends
    # a new Iceberg snapshot — the reference's ongoing iceberg sync shape)
    ap.add_argument("--export-iceberg", default=None, metavar="DEST_DIR")
    ap.add_argument("--export-format-version", type=int, default=2,
                    choices=[2, 3],
                    help="Iceberg format for --export-iceberg: 2 = position-"
                         "delete parquet, 3 = puffin deletion-vector blobs")
    ap.add_argument("--export-partition-by", default=None, metavar="EXPRS",
                    help="comma-separated partition entries for "
                         "--export-iceberg: column names (identity) or "
                         "monotonic transform exprs (day(ts), year(ts), "
                         "truncate[4](name)); stats-driven and "
                         "zero-rewrite — files must already be aligned "
                         "(--curve align)")
    ap.add_argument("--mirror-expire-keep", type=int, default=None,
                    metavar="K",
                    help="after --export-iceberg, expire mirror versions "
                         "beyond the newest K (prunes mirror metadata, "
                         "deletes mirror-local files, releases old pins)")
    args = ap.parse_args()
    if bool(args.table) == bool(args.warehouse):
        ap.error("pass exactly one of --table or --warehouse")

    from pyspark.sql import SparkSession

    # no master/memory here: spark-submit owns cluster sizing. Local smoke
    # runs work too (spark-submit --master local[4]).
    spark = (
        SparkSession.builder.appName("moonlink-maintain")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    if args.warehouse:
        from moonlink_spark.streaming.ingest import MaintenancePolicy
        from moonlink_spark.warehouse import Warehouse

        by = args.cluster_by.split(",") if args.cluster_by else None
        policy = (
            MaintenancePolicy(cluster_by=by, curve=args.curve)
            if by
            else MaintenancePolicy(curve=args.curve)
        )
        wh = Warehouse(spark, args.warehouse)
        report = wh.maintain_all(
            policy,
            expire_retain=args.expire_retain,
            sweep_grace_seconds=args.sweep_grace_seconds,
            run_id=args.run_id,
        )
        print(json.dumps({"warehouse": args.warehouse, "tables": report}))
        spark.stop()
        return

    from moonlink_spark.operators.clustering import cluster
    from moonlink_spark.operators.compaction import CompactionConfig, compact
    from moonlink_spark.operators.expire import expire_snapshots, sweep_orphans
    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.operators.optimize import optimize
    from moonlink_spark.table import MoonTable

    table = MoonTable.load(spark, args.table)
    run_id = args.run_id
    by = args.cluster_by.split(",") if args.cluster_by else None
    out: dict = {"table": args.table, "steps": {}}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out["steps"][name] = round(time.time() - t0, 3)
        return r

    if args.rollback_to is not None:
        from moonlink_spark.operators.rollback import rollback_to

        snap = timed("rollback", lambda: rollback_to(
            table, args.rollback_to,
            run_id=(run_id and f"{run_id}-rb") or None, lock_wait_seconds=3600))
        out["rows"] = table.scan().count()
        out["files"] = len(table.data_files())
        out["snapshot"] = snap
        print(json.dumps(out))
        spark.stop()
        return

    if args.changes:
        changes = spark.read.parquet(args.changes)
        res = timed("merge", lambda: merge_into(
            table, changes, run_id=(run_id and f"{run_id}-m") or None,
            lock_wait_seconds=3600,
        ))
        out["merge"] = {"inserted": res.inserted_rows, "deleted": res.deleted_positions}

    if args.mode == "split":
        timed("compact", lambda: compact(
            table, CompactionConfig(mode="force_full"),
            run_id=(run_id and f"{run_id}-c") or None, lock_wait_seconds=3600))
        if by:
            timed("cluster", lambda: cluster(
                table, by=by, curve=args.curve,
                run_id=(run_id and f"{run_id}-z") or None, lock_wait_seconds=3600))
    else:
        timed("optimize", lambda: optimize(
            table, mode=args.mode, cluster_by=by, curve=args.curve,
            run_id=(run_id and f"{run_id}-o") or None, lock_wait_seconds=3600))

    if args.expire_retain is not None:
        timed("expire", lambda: expire_snapshots(table, retain_last=args.expire_retain))
        swept = timed("sweep", lambda: sweep_orphans(
            table, quarantine=(args.sweep_mode == "quarantine"),
            older_than_seconds=args.sweep_grace_seconds))
        out["swept_files"] = len(swept)

    if args.export_iceberg:
        from moonlink_spark.iceberg import export_iceberg

        out["iceberg_metadata"] = timed(
            "export_iceberg",
            lambda: export_iceberg(
                table, args.export_iceberg,
                format_version=args.export_format_version,
                partition_by=(args.export_partition_by.split(",")
                              if args.export_partition_by else None),
            ),
        )
        if args.mirror_expire_keep is not None:
            from moonlink_spark.iceberg import expire_iceberg_mirror

            out["mirror_expire"] = timed(
                "mirror_expire",
                lambda: expire_iceberg_mirror(
                    spark, args.export_iceberg,
                    keep_last=args.mirror_expire_keep, source_table=table,
                ),
            )

    out["rows"] = table.scan().count()
    out["files"] = len(table.data_files())
    out["snapshot"] = table.current_snapshot_id()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
