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

# broadcast the deduped change-key projection below this ESTIMATED size —
# gate on bytes, not rows: 5M wide string keys would be a multi-hundred-MB
# broadcast. Above the gate the probe falls back to a shuffle join (AQE picks
# sort-merge / shuffled-hash and handles skew).
_BROADCAST_CHANGE_BYTES = 64 * 1024 * 1024
# per-key overhead on top of the raw key bytes (UnsafeRow + hash relation)
_BROADCAST_KEY_OVERHEAD = 32


@dataclass
class MergeResult:
    snapshot_id: int
    inserted_rows: int
    deleted_positions: int
    matched_keys: int


class ConcurrentAppendOverlap(Exception):
    """A lock-free append landed during the merge and its key range may
    intersect the change batch's. The commit rebase folds appended files in
    UNPROBED — if one holds a key the batch upserts, committing would leave
    two live rows for that key (the append's row was never position-deleted
    and the merge's insert also lands). Retryable: re-run the merge with the
    same run_id — the fresh probe sees the appended files."""


def _overlapping_foreign_appends(
    fresh_files: list, planned_paths: set[str], out_set: set[str],
    key: str, klo, khi,
) -> list:
    """Data files present now but absent from the snapshot the probe planned
    against (and not our own outputs), whose per-file [min,max] key stats
    may intersect the batch's [klo,khi]. Missing stats → conservatively
    overlapping."""
    out = []
    for f in fresh_files:
        p = norm_path(f.file_path)
        if p in planned_paths or p in out_set:
            continue
        st = (f.stats or {}).get(key) or {}
        fmin, fmax = st.get("min"), st.get("max")
        if fmin is None or fmax is None or klo is None:
            out.append(f)
            continue
        if not (fmax < klo or fmin > khi):
            out.append(f)
    return out


def _per_file_positions(delete_files: list) -> dict[str, int]:
    """Per-target-file deleted-position counts, read back from freshly
    written bitmap delete files (one row per target file; the files are
    ≤16 KB bitmaps, so a driver-side columnar read of just
    (file_path, n_positions) is metadata-cardinality work)."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for d in delete_files:
        t = pq.read_table(d.file_path, columns=["file_path", "n_positions"])
        for p, n in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
            p = norm_path(p)
            out[p] = out.get(p, 0) + int(n)
    return out


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


def _completed_run(table: MoonTable, run_id: str) -> MergeResult | None:
    """exactly-once per run_id: a retry after a successful commit must not
    re-apply (it would probe its own committed output files). Same pattern
    as streaming epoch replay / Iceberg txn-version checks; the retry
    window must precede snapshot expiry, like moonlink's WAL truncation
    horizon (wal.rs truncates only ≤ the iceberg-persisted LSN)."""
    for s in table.snapshots():
        if s.operation == "merge" and s.summary.get("run_id") == run_id:
            return MergeResult(
                snapshot_id=s.snapshot_id,
                inserted_rows=int(s.summary.get("added-records", 0)),
                deleted_positions=int(s.summary.get("matched-keys", 0)),
                matched_keys=int(s.summary.get("matched-keys", 0)),
            )
    return None


def merge_into(
    table: MoonTable,
    changes: DataFrame,
    run_id: str | None = None,
    rows_per_file: int = 131_072,
    lock_wait_seconds: float = 300.0,
) -> MergeResult:
    """Apply a CDC batch to *table*; returns the committed MergeResult.

    Takes the table's maintenance lock: a merge publishes a COMPLETE file
    list computed from the snapshot it planned against, so racing a
    concurrent compaction/clustering would silently resurrect that job's
    victims and drop its outputs. Moonlink serializes every table event
    through one event loop (table_handler.rs:202-218); the advisory lock is
    the multi-process analog. Lock-free appends are tolerated: the commit
    rebase below folds concurrently-appended files into the survivor set."""
    run_id = run_id or uuid.uuid4().hex[:12]

    done = _completed_run(table, run_id)
    if done is not None:
        return done
    with table.maintenance_lock("merge", run_id, wait_seconds=lock_wait_seconds):
        # re-check under the lock: another process may have completed this
        # run_id while we waited
        done = _completed_run(table, run_id)
        if done is not None:
            return done
        return _merge_locked(table, changes, run_id, rows_per_file)


def _merge_locked(
    table: MoonTable,
    changes: DataFrame,
    run_id: str,
    rows_per_file: int,
) -> MergeResult:
    import os

    key = table.key_columns[0]
    cols = [f.name for f in table.schema.fields]
    # per-partition lineage (north rule) for the INSERT writes only: their
    # bin contents are a pure function of the change batch (LWW collapse +
    # hash binning), so a merge killed mid-write resumes skipping completed
    # bins. The DELETE write gets NO lineage on purpose: its positions come
    # from probing TABLE STATE, which a lock-free append can change between
    # a failed attempt and its retry — resuming stale delete bins would
    # silently skip newly-matched positions. Deletes re-write fully on
    # retry (idempotent: same file names, tiny bitmaps).
    lineage_root = os.path.join(table.catalog.metadata_dir, "lineage", run_id)
    ins_lineage = os.path.join(lineage_root, "inserts")

    import time as _time

    stage_t: dict[str, float] = {}
    _t0 = _time.time()

    final = last_writer_wins(changes, key)
    final.cache()
    try:
        # ONE action materializes the cache AND yields every scalar the plan
        # needs: row count, commit-LSN baseline (mooncake_table.rs:1290-1312:
        # the snapshot's flush_lsn = highest lsn applied, consumed by
        # read-at-LSN scans), broadcast byte estimate, batch key bounds for
        # manifest pruning, and the delete-row count (insert count = n - d,
        # saving a separate inserts.count() job)
        head = final.agg(
            F.count("*").alias("n"),
            F.max("lsn").alias("mx"),
            F.avg(F.length(F.col(key).cast("string"))).alias("keylen"),
            F.min(key).alias("klo"),
            F.max(key).alias("khi"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("nd"),
        ).first()
        n_final = int(head["n"])
        # monotonic clamp: an empty batch (mx None -> parent) or an
        # out-of-order CDC file whose max lsn is below an earlier batch's
        # must never REGRESS the flush-lsn — scan_at_lsn(X) would otherwise
        # pick this snapshot and return rows with lsn > X
        batch_lsn = int(head["mx"]) if head["mx"] is not None else 0
        flush_lsn = max(table.current_flush_lsn(), batch_lsn)
        stage_t["lww_head_sec"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()

        # --- position resolution: join IS the index (hash_index.rs analog) ----
        keys_df = final.select(key)
        est_bytes = n_final * (float(head["keylen"] or 8) + _BROADCAST_KEY_OVERHEAD)
        if est_bytes <= _BROADCAST_CHANGE_BYTES:
            keys_df = F.broadcast(keys_df)

        # manifest-stats file pruning: a file whose [min,max] key range
        # can't intersect the batch's key range can't hold a matching row —
        # skip probing it entirely (the moonlink analog: per-file min/max
        # Datum stats gating the index probe; on a key-clustered table this
        # turns a full-table probe into a few files)
        all_files = table.data_files()
        if n_final == 0:
            probe_files = []  # empty batch: nothing can match, skip the probe
        elif head["klo"] is not None:
            probe_files = table.plan_files({key: (head["klo"], head["khi"])})
        else:
            probe_files = all_files
        new_delete_files: list = []
        per_file_deletes: dict[str, int] = {}
        if probe_files:
            target_pos = table.scan(
                with_position=True, columns=[key, "_fp", "_pos"], files=probe_files
            )
            matched = target_pos.join(keys_df, key, "left_semi").select(
                F.col("_fp").alias("file_path"), F.col("_pos").alias("pos")
            )
            # ONE job resolves positions AND writes the bitmap DVs; the
            # per-file counts the commit needs come back from the written
            # bitmap rows (one (file_path, n_positions) row per target
            # file, read driver-side from the tiny at-rest files) — the
            # old separate groupBy+collect count job and the cache of the
            # probe output are gone. Bins are sized from the batch row
            # count (an upper bound on matches; identical below 4M rows).
            new_delete_files = table.write_position_deletes(
                matched, run_id=run_id, num_bins=table.dv_rewrite_bins(n_final)
            )
            per_file_deletes = _per_file_positions(new_delete_files)
        n_matched = int(sum(per_file_deletes.values()))
        stage_t["probe_delete_sec"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()

        # --- inserts: final rows that are not deletes ---------------------
        inserts = final.filter(F.col("op") != "D").select(*cols)
        n_inserts = n_final - int(head["nd"] or 0)
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
                lineage_dir=ins_lineage,
            )
        stage_t["insert_write_sec"] = round(_time.time() - _t0, 3)
    finally:
        final.unpersist()
    _t0 = _time.time()

    # --- atomic commit ----------------------------------------------------
    # a re-run of a completed run_id rewrites the same file names; exclude
    # them from "existing" or they'd be committed twice (same guard as
    # compaction's survivor set). The commit REBASES on CommitConflict:
    # compact/cluster can't race (they take the same lock), but lock-free
    # appends can — they're purely additive, so re-reading fresh state and
    # re-committing folds their files into the survivor set (their rows were
    # not visible at plan time and are correctly left unprobed).
    from moonlink_spark.catalog.catalog import CommitConflict

    out_set = {norm_path(f.file_path) for f in new_data_files}
    out_del = {norm_path(f.file_path) for f in new_delete_files}
    planned_paths = {norm_path(f.file_path) for f in all_files}
    last_conflict: Exception | None = None
    for _ in range(5):
        # read the parent BEFORE the file lists and pin the commit to it:
        # without the pin, an append committing between this read and the
        # CAS would be silently clobbered (our complete list lacks its
        # files but the version CAS still succeeds)
        parent_sid = table.current_snapshot_id()
        data_files = [
            f for f in table.data_files() if norm_path(f.file_path) not in out_set
        ]
        # rebase safety: folding a concurrent append in unprobed is only
        # sound when its key range can't intersect the batch's — otherwise
        # fail retryable instead of committing a duplicate-key state
        if n_final > 0:
            foreign = _overlapping_foreign_appends(
                data_files, planned_paths, out_set, key, head["klo"], head["khi"]
            )
            if foreign:
                raise ConcurrentAppendOverlap(
                    f"{len(foreign)} file(s) appended during merge run "
                    f"{run_id} overlap the batch key range "
                    f"[{head['klo']!r}, {head['khi']!r}] — re-run the merge "
                    f"(same run_id) to probe them"
                )
        prior_deletes = [
            d for d in table.delete_files() if norm_path(d.file_path) not in out_del
        ]
        for f in data_files:
            extra = per_file_deletes.get(norm_path(f.file_path), 0)
            if extra:
                f.deleted_count += int(extra)
        try:
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
                expected_parent_snapshot=parent_sid,
            )
            break
        except CommitConflict as e:
            last_conflict = e
    else:
        raise last_conflict  # type: ignore[misc]
    stage_t["commit_sec"] = round(_time.time() - _t0, 3)
    # stage split in lineage (same observability as cluster's metrics.json):
    # lww_head = LWW collapse + one-action scalars, probe = position
    # resolution join, delete/insert writes, commit = manifest publish
    os.makedirs(lineage_root, exist_ok=True)
    with open(os.path.join(lineage_root, "metrics.json"), "w") as fh:
        import json as _json

        _json.dump({
            "op": "merge",
            "matched_keys": n_matched,
            "inserted_rows": n_inserts,
            "probed_files": len(probe_files),
            "total_files": len(all_files),
            "stage_seconds": stage_t,
        }, fh)
    return MergeResult(
        snapshot_id=sid,
        inserted_rows=n_inserts,
        deleted_positions=n_matched,
        matched_keys=n_matched,
    )
