"""MoonTable — the table façade: create / load / append / scan / commit.

Re-creates moonlink's MooncakeTable + IcebergTableManager surface
(reference: storage/mooncake_table.rs:85-184; iceberg_table_manager.rs) as a
thin driver-side coordinator over the FileCatalog. All data movement is
Spark; the table object only shuffles metadata.

Snapshot isolation: a scan at snapshot S reads exactly the data files of S
minus the position deletes of S — never mid-maintenance state. Commits are
serialized by the catalog CAS (catalog.py), mirroring moonlink's
single-event-loop + version-hint CAS guarantee (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
import pyspark.sql.types as T

from moonlink_spark.catalog.catalog import FileCatalog
from moonlink_spark.catalog.manifests import (
    read_data_manifests,
    read_delete_manifests,
    write_data_manifests,
    write_delete_manifests,
)
from moonlink_spark.catalog.metadata import (
    FRESH_TARGET_BYTES,
    MANIFEST_MAX_ENTRIES,
    DataFile,
    DeleteFile,
    Snapshot,
    TableMetadata,
    norm_path,
)
from moonlink_spark.plans.physical import hash_bin, write_datafiles

# broadcast position-delete sets up to this size during scans
_BROADCAST_DELETES_BYTES = 256 * 1024 * 1024


class MaintenanceInProgress(Exception):
    """Another maintenance job holds this table's advisory lock."""


class MoonTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.catalog = FileCatalog(root)
        self.root = self.catalog.root

    # ------------------------------------------------------------- lifecycle
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_columns: list[str],
        properties: dict | None = None,
    ) -> "MoonTable":
        t = MoonTable(spark, root)
        t.catalog.ensure_dirs()
        if t.catalog.exists():
            raise FileExistsError(f"table already exists at {root}")
        meta = TableMetadata(
            table_uuid=uuid.uuid4().hex,
            location=t.root,
            schema_json=schema.json(),
            key_columns=list(key_columns),
            properties=properties or {},
        )
        t.catalog.commit(meta, expected_version=0)
        return t

    @staticmethod
    def load(spark: SparkSession, root: str) -> "MoonTable":
        t = MoonTable(spark, root)
        t.catalog.load()  # raises if absent
        return t

    # ------------------------------------------------------------- metadata
    @property
    def meta(self) -> TableMetadata:
        return self.catalog.load()

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.meta.schema_json))

    @property
    def key_columns(self) -> list[str]:
        return self.meta.key_columns

    def current_snapshot_id(self) -> int | None:
        return self.meta.current_snapshot_id

    def snapshots(self) -> list[Snapshot]:
        return self.meta.snapshots

    def data_files(self, snapshot_id: int | None = None) -> list[DataFile]:
        meta = self.meta
        snap = (
            meta.current_snapshot()
            if snapshot_id is None
            else meta.snapshot_by_id(snapshot_id)
        )
        if snap is None:
            return []
        return read_data_manifests(self.catalog.metadata_dir, snap.manifests)

    def delete_files(self, snapshot_id: int | None = None) -> list[DeleteFile]:
        meta = self.meta
        snap = (
            meta.current_snapshot()
            if snapshot_id is None
            else meta.snapshot_by_id(snapshot_id)
        )
        if snap is None:
            return []
        return read_delete_manifests(self.catalog.metadata_dir, snap.delete_manifests)

    # ------------------------------------------------------------- commit
    def commit_snapshot(
        self,
        operation: str,
        data_files: list[DataFile],
        delete_files: list[DeleteFile],
        summary: dict | None = None,
        force_rewrite: bool = False,
    ) -> int:
        """Commit the *complete* new file state as a snapshot via catalog CAS.
        Returns the new snapshot id.

        Manifest writes are INCREMENTAL (O(delta), not O(table)): chunks of
        the parent snapshot whose entries are unchanged are reused by name;
        only added files and files in touched chunks get fresh chunks
        (reference behaviour: data_file_manifest_manager.rs:54-100 drops
        removed entries and rolls at 25k). *force_rewrite* coalesces
        everything into freshly rolled chunks (the rewrite_manifests job).
        """
        from moonlink_spark.catalog.manifests import incremental_reuse

        meta = self.catalog.load()
        version = self.catalog.current_version()
        seq = meta.last_sequence_number + 1
        parent = meta.current_snapshot()
        max_entries = int(meta.properties.get("manifest.max-entries", MANIFEST_MAX_ENTRIES))
        if force_rewrite or parent is None:
            manifests = write_data_manifests(
                self.catalog.metadata_dir,
                sorted(data_files, key=lambda d: d.file_path),
                max_entries=max_entries,
            )
            delete_manifests = write_delete_manifests(
                self.catalog.metadata_dir,
                sorted(delete_files, key=lambda d: d.file_path),
                max_entries=max_entries,
            )
        else:
            kept, residual = incremental_reuse(
                self.catalog.metadata_dir, parent.manifests, data_files,
                read_data_manifests,
            )
            manifests = kept + write_data_manifests(
                self.catalog.metadata_dir,
                sorted(residual, key=lambda d: d.file_path),
                max_entries=max_entries,
            )
            kept_d, residual_d = incremental_reuse(
                self.catalog.metadata_dir, parent.delete_manifests, delete_files,
                read_delete_manifests,
            )
            delete_manifests = kept_d + write_delete_manifests(
                self.catalog.metadata_dir,
                sorted(residual_d, key=lambda d: d.file_path),
                max_entries=max_entries,
            )
        snap = Snapshot(
            snapshot_id=seq,
            parent_id=meta.current_snapshot_id,
            sequence_number=seq,
            operation=operation,
            manifests=manifests,
            delete_manifests=delete_manifests,
            summary=summary or {},
            timestamp_ms=seq,
        )
        meta.snapshots.append(snap)
        meta.current_snapshot_id = seq
        meta.last_sequence_number = seq
        self.catalog.commit(meta, expected_version=version)
        return seq

    # ------------------------------------------------------------- ingest
    def append(
        self,
        df: DataFrame,
        run_id: str | None = None,
        rows_per_file: int = 131_072,
        explicit_bins: DataFrame | None = None,
        num_bins: int | None = None,
    ) -> int:
        """Bulk ingest: write *df* as fresh snappy data files and fast-append
        them (reference: batch_ingestion.rs:20-166 + fast-append in
        iceberg_table_syncer.rs:723-838).

        File sizing follows the mem-slice flush threshold (131 072 rows,
        mooncake_table_config.rs:159) unless the caller passes explicit bins.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        key = self.key_columns[0] if self.key_columns else df.columns[0]
        if explicit_bins is not None:
            binned = explicit_bins
            nb = num_bins or 1
        else:
            n = df.count()
            nb = max(1, -(-n // rows_per_file))
            binned = df.withColumn("_bin", hash_bin(key, nb))
        new_files = write_datafiles(
            binned,
            data_dir=self.catalog.data_dir,
            run_id=run_id,
            num_bins=nb,
            compression="snappy",
        )
        existing = self.data_files()
        sid = self.commit_snapshot(
            "append",
            existing + new_files,
            self.delete_files(),
            summary={
                "added-files": len(new_files),
                "added-records": sum(f.record_count for f in new_files),
                "run_id": run_id,
            },
        )
        return sid

    def add_files(self, paths: list[str], run_id: str | None = None) -> int:
        """Register EXISTING parquet files as-is — no read, no rewrite, no
        validation of row contents (moonlink's bulk ingest loads files
        verbatim, batch_ingestion.rs:20-166). Stats and row counts come from
        a distributed parquet-footer read, so table-level planning
        (compaction selection, manifest stats) works immediately.
        """
        from moonlink_spark.catalog.stats import footer_stats

        run_id = run_id or uuid.uuid4().hex[:12]
        norm = [norm_path(p) for p in paths]
        existing_paths = {norm_path(f.file_path) for f in self.data_files()}
        dup = existing_paths & set(norm)
        if dup:
            raise ValueError(f"files already registered: {sorted(dup)[:3]}...")
        got = footer_stats(self.spark, norm)
        new_files = [
            DataFile(
                file_path=p,
                record_count=got[p]["record_count"],
                file_size_bytes=got[p]["file_size_bytes"],
                stats=got[p]["stats"],
            )
            for p in norm
        ]
        return self.commit_snapshot(
            "add-files",
            self.data_files() + new_files,
            self.delete_files(),
            summary={
                "run_id": run_id,
                "added-files": len(new_files),
                "added-records": sum(f.record_count for f in new_files),
            },
        )

    # ------------------------------------------------------------- scan
    def _read_data(self, files: list[DataFile], with_position: bool) -> DataFrame:
        schema = self.schema
        if not files:
            df = self.spark.createDataFrame([], schema)
            if with_position:
                df = df.withColumn("_fp", F.lit(None).cast("string")).withColumn(
                    "_pos", F.lit(None).cast("long")
                )
            return df
        reader = self.spark.read.schema(schema).parquet(*[f.file_path for f in files])
        if with_position:
            reader = reader.select(
                "*",
                F.regexp_replace(F.col("_metadata.file_path"), "^file:", "").alias("_fp"),
                F.col("_metadata.row_index").alias("_pos"),
            )
        return reader

    def _read_deletes(self, dfiles: list[DeleteFile]) -> DataFrame | None:
        if not dfiles:
            return None
        deletes = self.spark.read.schema("file_path string, pos long").parquet(
            *[d.file_path for d in dfiles]
        )
        if sum(d.file_size_bytes for d in dfiles) <= _BROADCAST_DELETES_BYTES:
            deletes = F.broadcast(deletes)
        return deletes

    def scan(
        self,
        snapshot_id: int | None = None,
        columns: list[str] | None = None,
        with_position: bool = False,
        files: list[DataFile] | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read: data files of the snapshot, anti-joined
        with its position deletes (reference read path:
        snapshot_read.rs:152-241 + DV RowSelection in table_provider.rs).

        Column pruning and filter pushdown stay with Catalyst — when the
        caller filters/projects the returned DataFrame, the parquet scan
        reads only what's needed. *files* restricts the scan to a planner-
        chosen subset (manifest-stats pruning); delete filtering still
        applies.
        """
        files = self.data_files(snapshot_id) if files is None else files
        dfiles = self.delete_files(snapshot_id)
        need_pos = with_position or bool(dfiles)
        df = self._read_data(files, with_position=need_pos)
        deletes = self._read_deletes(dfiles)
        if deletes is not None:
            df = df.join(
                deletes,
                (df["_fp"] == deletes["file_path"]) & (df["_pos"] == deletes["pos"]),
                "left_anti",
            )
        if not with_position and need_pos:
            df = df.drop("_fp", "_pos")
        if columns:
            df = df.select(*columns)
        return df

    # ----------------------------------------------------- maintenance lock
    def maintenance_lock(self, job: str, run_id: str):
        """Advisory mutual exclusion for background maintenance: at most one
        compaction/clustering in flight per table (table_handler.rs:526-609
        serializes maintenance through the event loop; here an O_EXCL lock
        file carries {job, run_id} so a second scheduler sees who holds it).

        Re-entrant for the SAME run_id (a resumed run re-acquires its own
        lock); stale locks are the operator's to clear (lock file names the
        holder). Returns a context manager."""
        import contextlib
        import json as _json

        lock_path = os.path.join(self.catalog.metadata_dir, "maintenance.lock")

        @contextlib.contextmanager
        def _lock():
            created = False
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                created = True
                with os.fdopen(fd, "w") as f:
                    _json.dump({"job": job, "run_id": run_id}, f)
            except FileExistsError:
                with open(lock_path) as f:
                    holder = _json.load(f)
                if holder.get("run_id") != run_id:
                    raise MaintenanceInProgress(
                        f"{holder.get('job')} run {holder.get('run_id')} holds "
                        f"the maintenance lock on {self.root}"
                    ) from None
                # re-entrant re-acquire: the original holder owns the release
            try:
                yield
            finally:
                if created:
                    try:
                        os.unlink(lock_path)
                    except FileNotFoundError:
                        pass

        return _lock()

    # --------------------------------------------------------- read-at-LSN
    def snapshot_for_lsn(self, lsn: int) -> Snapshot | None:
        """The read-at-LSN protocol (read_state_manager.rs:59-164): return
        the latest snapshot whose flush LSN ≤ *lsn* — a scan at LSN X sees
        exactly the records committed at ≤ X (mooncake_table.rs:432-445).

        Snapshots that don't advance the LSN (compact/cluster/append) inherit
        their parent's flush LSN, so maintenance never changes what a given
        LSN reads."""
        best: Snapshot | None = None
        eff = 0
        for s in self.meta.snapshots:  # sequence order
            eff = int(s.summary.get("flush-lsn", eff))
            if eff <= lsn:
                best = s
        return best

    def scan_at_lsn(self, lsn: int, columns: list[str] | None = None) -> DataFrame:
        """Snapshot-isolated scan at an LSN watermark. Raises if no snapshot
        is visible at *lsn* (moonlink would block until replication catches
        up; in batch context that's an error)."""
        snap = self.snapshot_for_lsn(lsn)
        if snap is None:
            raise ValueError(f"no snapshot visible at lsn {lsn}")
        return self.scan(snapshot_id=snap.snapshot_id, columns=columns)

    # ------------------------------------------------------------- lifecycle
    def drop(self) -> None:
        """Drop the table: delete data, metadata, and the table directory
        (table_handler.rs:158-185 — drop iceberg table + WAL + local dir)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)

    # ------------------------------------------------------------- utils
    def all_reachable_paths(self) -> set[str]:
        """Every data/delete file referenced by ANY retained snapshot (used
        by the orphan sweep)."""
        out: set[str] = set()
        meta = self.meta
        for s in meta.snapshots:
            for f in read_data_manifests(self.catalog.metadata_dir, s.manifests):
                out.add(norm_path(f.file_path))
            for d in read_delete_manifests(self.catalog.metadata_dir, s.delete_manifests):
                out.add(norm_path(d.file_path))
        return out

    def write_position_deletes(
        self, deletes_df: DataFrame, run_id: str, num_bins: int = 1
    ) -> list[DeleteFile]:
        """Persist (file_path, pos) rows as position-delete parquet files
        (the puffin-DV analog, deletion_vector.rs)."""
        binned = deletes_df.select(
            F.col("file_path").cast("string"), F.col("pos").cast("long")
        ).withColumn("_bin", hash_bin("file_path", num_bins))
        files = write_datafiles(
            binned,
            data_dir=self.catalog.data_dir,
            run_id=run_id,
            num_bins=num_bins,
            compression="snappy",
            sort_within=["file_path", "pos"],
            file_prefix="del-",
        )
        return [
            DeleteFile(
                file_path=f.file_path,
                record_count=f.record_count,
                file_size_bytes=f.file_size_bytes,
            )
            for f in files
        ]
