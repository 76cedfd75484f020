"""MERGE INTO — the CDC upsert kernel, mirroring moonlink's apply semantics.

Reference semantics being re-created (SURVEY.md §2 rows 2-3, 10-12; §3.2):
  - change batch rows are (op ∈ {I,U,D}, lsn, <full row>) — moonlink's
    TableEvent stream where Update = Delete(old)+Append(new) at the same LSN
    (moonlink_sink.rs:295-326);
  - per-key last-writer-wins at max lsn (visibility rule in
    snapshot.rs:925-941: a delete at LSN X targets rows committed < X);
  - U is a FULL-ROW replace; I on an existing key upserts; D on a missing
    key is a no-op (delete_if_exists, mooncake_table.rs:1286-1288).

Spark-first design: moonlink resolves delete positions by probing its
bucketed hash file-index (persisted_bucket_hash_map.rs) — here *the join is
the index*: the deduped change batch (small) is broadcast-joined against a
positional scan of the target that reads ONLY the key column plus parquet
metadata (_metadata.file_path/row_index) — Catalyst prunes every payload
column, so the probe never touches image bytes. Matched positions become
position-delete files (the puffin-DV analog); surviving change rows become
fresh data files. One atomic snapshot commit publishes both.

At 100 TB scale: the target-side scan is embarrassingly parallel and
column-pruned; the only shuffle is on the (small) change batch; skewed keys
are impossible post-LWW (keys are unique). AQE skew-join handles pathological
file/row distribution on the probe side.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from moonlink_spark.catalog.metadata import norm_path
from moonlink_spark.plans.physical import hash_bin, write_datafiles
from moonlink_spark.table import MoonTable

# broadcast the deduped change batch below this row count (well under the
# default 10MB autoBroadcast threshold for key-only projections)
_BROADCAST_CHANGE_ROWS = 5_000_000


@dataclass
class MergeResult:
    snapshot_id: int
    inserted_rows: int
    deleted_positions: int
    matched_keys: int


def last_writer_wins(changes: DataFrame, key: str) -> DataFrame:
    """Collapse a change batch to one final row per key: highest lsn wins;
    on an lsn tie the non-delete row wins (moonlink's update decomposition
    emits Delete(old)+Append(new) at the SAME lsn — the append is final)."""
    w = Window.partitionBy(key).orderBy(
        F.col("lsn").desc(),
        F.when(F.col("op") == "D", 1).otherwise(0).asc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into(
    table: MoonTable,
    changes: DataFrame,
    run_id: str | None = None,
    rows_per_file: int = 131_072,
) -> MergeResult:
    """Apply a CDC batch to *table*; returns the committed MergeResult."""
    run_id = run_id or uuid.uuid4().hex[:12]

    # exactly-once per run_id: a retry after a successful commit must not
    # re-apply (it would probe its own committed output files). Same pattern
    # as streaming epoch replay / Iceberg txn-version checks; the retry
    # window must precede snapshot expiry, like moonlink's WAL truncation
    # horizon (wal.rs truncates only ≤ the iceberg-persisted LSN).
    for s in table.snapshots():
        if s.operation == "merge" and s.summary.get("run_id") == run_id:
            return MergeResult(
                snapshot_id=s.snapshot_id,
                inserted_rows=int(s.summary.get("added-records", 0)),
                deleted_positions=int(s.summary.get("matched-keys", 0)),
                matched_keys=int(s.summary.get("matched-keys", 0)),
            )

    key = table.key_columns[0]
    cols = [f.name for f in table.schema.fields]

    final = last_writer_wins(changes, key)
    final.cache()
    try:
        # one action materializes the cache AND yields count + commit-LSN
        # baseline (mooncake_table.rs:1290-1312): the snapshot's flush_lsn =
        # highest lsn applied, consumed by read-at-LSN scans
        head = final.agg(
            F.count("*").alias("n"), F.max("lsn").alias("mx")
        ).first()
        n_final = int(head["n"])
        flush_lsn = int(head["mx"]) if head["mx"] is not None else 0

        # --- position resolution: join IS the index (hash_index.rs analog) ----
        keys_df = final.select(key)
        if n_final <= _BROADCAST_CHANGE_ROWS:
            keys_df = F.broadcast(keys_df)

        # manifest-stats file pruning: a file whose [min,max] key range
        # can't intersect the batch's key range can't hold a matching row —
        # skip probing it entirely (the moonlink analog: per-file min/max
        # Datum stats gating the index probe; on a key-clustered table this
        # turns a full-table probe into a few files)
        all_files = table.data_files()
        kb = final.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
        probe_files = all_files
        if kb["lo"] is not None:
            pruned = []
            for f in all_files:
                st = f.stats.get(key) or {}
                mn, mx = st.get("min"), st.get("max")
                if mn is not None and mx is not None and (mx < kb["lo"] or mn > kb["hi"]):
                    continue
                pruned.append(f)
            probe_files = pruned
        target_pos = table.scan(
            with_position=True, columns=[key, "_fp", "_pos"], files=probe_files
        )
        matched = target_pos.join(keys_df, key, "left_semi").select(
            F.col("_fp").alias("file_path"), F.col("_pos").alias("pos")
        )
        matched.cache()
        try:
            per_file_deletes = {
                norm_path(r["file_path"]): r["cnt"]
                for r in matched.groupBy("file_path").agg(F.count("*").alias("cnt")).collect()
            }
            n_matched = int(sum(per_file_deletes.values()))

            new_delete_files = []
            if n_matched > 0:
                nb = max(1, n_matched // 4_000_000 + 1)
                new_delete_files = table.write_position_deletes(
                    matched, run_id=run_id, num_bins=nb
                )

            # --- inserts: final rows that are not deletes ---------------------
            inserts = final.filter(F.col("op") != "D").select(*cols)
            n_inserts = inserts.count()
            new_data_files = []
            if n_inserts > 0:
                # bin by BYTES, not rows: wide binary payloads would turn a
                # row-count bin into one multi-GB serial write task. Average
                # row size comes from the target table's own manifests
                # (free metadata); fresh files target 128 MiB snappy
                # (mooncake_table_config.rs:24).
                from moonlink_spark.catalog.metadata import FRESH_TARGET_BYTES

                existing_files = table.data_files()
                tot_rows = sum(f.record_count for f in existing_files)
                tot_bytes = sum(f.file_size_bytes for f in existing_files)
                if tot_rows > 0:
                    est_bytes = n_inserts * (tot_bytes / tot_rows)
                    nb = max(1, -(-int(est_bytes) // FRESH_TARGET_BYTES))
                else:
                    nb = max(1, -(-n_inserts // rows_per_file))
                binned = inserts.withColumn("_bin", hash_bin(key, nb))
                new_data_files = write_datafiles(
                    binned,
                    data_dir=table.catalog.data_dir,
                    run_id=run_id,
                    num_bins=nb,
                    compression="snappy",
                )
        finally:
            matched.unpersist()
    finally:
        final.unpersist()

    # --- atomic commit ----------------------------------------------------
    # a re-run of a completed run_id rewrites the same file names; exclude
    # them from "existing" or they'd be committed twice (same guard as
    # compaction's survivor set)
    out_set = {norm_path(f.file_path) for f in new_data_files}
    out_del = {norm_path(f.file_path) for f in new_delete_files}
    data_files = [
        f for f in table.data_files() if norm_path(f.file_path) not in out_set
    ]
    prior_deletes = [
        d for d in table.delete_files() if norm_path(d.file_path) not in out_del
    ]
    for f in data_files:
        extra = per_file_deletes.get(norm_path(f.file_path), 0)
        if extra:
            f.deleted_count += int(extra)
    sid = table.commit_snapshot(
        "merge",
        data_files + new_data_files,
        prior_deletes + new_delete_files,
        summary={
            "run_id": run_id,
            "matched-keys": n_matched,
            "added-records": n_inserts,
            "added-files": len(new_data_files),
            "added-delete-files": len(new_delete_files),
            "flush-lsn": flush_lsn,
            "probed-files": len(probe_files),
            "total-files": len(all_files),
        },
    )
    return MergeResult(
        snapshot_id=sid,
        inserted_rows=n_inserts,
        deleted_positions=n_matched,
        matched_keys=n_matched,
    )
