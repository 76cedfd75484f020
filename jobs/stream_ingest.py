"""spark-submit entry point: continuous (or bounded) streaming CDC ingest.

The deployment twin of jobs/maintain.py — the reference's ingestion side
(moonlink_service consuming CDC/REST into per-table event loops) as one
Structured Streaming job:

    spark-submit --py-files moonlink_spark.zip jobs/stream_ingest.py \\
        --table /warehouse/images --source /landing/cdc \\
        --checkpoint /warehouse/_ckpt/images \\
        [--available-now] [--max-files-per-trigger 4] \\
        [--self-maintain --cluster-by phash,w,h]

Source = a parquet drop-directory of (op, lsn, <table columns>) CDC files;
each micro-batch is one transactional MERGE commit (exactly-once per epoch
via run_id "stream-{batch_id}"). --available-now drains the backlog and
exits (bounded backfill); otherwise the query runs until stopped.
--self-maintain attaches the MaintenancePolicy so incremental clustering
absorbs off-curve pressure inside the ingest loop. Prints one JSON line on
exit (AvailableNow) with rows/files/snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--self-maintain", action="store_true")
    ap.add_argument("--cluster-by", default="phash,w,h")
    ap.add_argument("--curve", default="zorder", choices=["zorder", "hilbert"])
    # continuous Iceberg sync: export every epoch's snapshot as a new
    # Iceberg v2 version under this dir (the reference's per-snapshot
    # iceberg persistence loop)
    ap.add_argument("--iceberg-mirror", default=None, metavar="DEST_DIR")
    ap.add_argument("--mirror-format-version", type=int, default=2,
                    choices=[2, 3])
    ap.add_argument("--mirror-keep-versions", type=int, default=8,
                    metavar="K", help="coherent mirror retention (0 = keep "
                    "every version; default matches MaintenancePolicy)")
    # durable ingest WAL: persist each epoch before apply; recover a pruned
    # source via moonlink_spark.streaming.wal.replay_wal
    ap.add_argument("--wal-dir", default=None, metavar="DIR")
    ap.add_argument("--source-format", default="parquet",
                    choices=["parquet", "json", "wal2json", "avro",
                             "avro_wire", "proto"])
    ap.add_argument("--avro-registry", default=None, metavar="DIR",
                    help="schema-registry dir for --source-format avro_wire")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("moonlink-stream-ingest")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from moonlink_spark.streaming.ingest import (
        MaintenancePolicy,
        ingest_cdc_dir,
        start_cdc_stream,
    )
    from moonlink_spark.table import MoonTable

    table = MoonTable.load(spark, args.table)
    policy = (
        MaintenancePolicy(cluster_by=args.cluster_by.split(","), curve=args.curve)
        if args.self_maintain
        else None
    )
    if args.iceberg_mirror:
        # mirroring without clustering: thresholds that never fire
        policy = policy or MaintenancePolicy(max_unclustered_files=1 << 60,
                                             max_unclustered_bytes=1 << 60)
        policy.iceberg_mirror = args.iceberg_mirror
        policy.mirror_format_version = args.mirror_format_version
        policy.mirror_keep_versions = args.mirror_keep_versions or None

    if args.available_now:
        ingest_cdc_dir(
            table,
            args.source,
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            maintenance=policy,
            format=args.source_format,
            wal_dir=args.wal_dir,
            avro_registry_dir=args.avro_registry,
        )
        print(json.dumps({
            "table": args.table,
            "rows": table.scan().count(),
            "files": len(table.data_files()),
            "snapshot": table.current_snapshot_id(),
            "snapshots": [s.operation for s in table.snapshots()],
        }))
        spark.stop()
        return

    # continuous mode: build the typed readStream and run until stopped
    import pyspark.sql.types as T

    src_schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
            *table.schema.fields,
        ]
    )
    reader = spark.readStream.schema(src_schema)
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    q = start_cdc_stream(
        table, reader.parquet(args.source), args.checkpoint, maintenance=policy,
        wal_dir=args.wal_dir,
    )
    q.awaitTermination()


if __name__ == "__main__":
    sys.exit(main())
