"""Incremental changelog reads: row-level changes between two snapshots.

The CDC-OUT surface (Iceberg's incremental/changelog read; the counterpart
of moonlink's CDC-in apply — a downstream consumer replays exactly what a
span of commits did to the table):

    scan_changes(table, from_snapshot_id, to_snapshot_id)
      -> DataFrame[_change_op ('I'|'D'), _change_snapshot_id, <row payload>]

Semantics per snapshot in (from, to], walked in sequence order:

- append / add-files: every row of the snapshot's ADDED data files is an
  'I' change.
- merge: added data files are 'I' rows (the post-image of upserts + fresh
  inserts); the snapshot's ADDED position-delete files identify the
  pre-image rows — read from the PARENT snapshot's file set by position —
  emitted as 'D'. An update therefore appears as D(old) + A(new), exactly
  the decomposition moonlink's CDC stream uses (moonlink_sink.rs:295-326).
- compact / cluster / rewrite-manifests / alter / expire: row sets are
  preserved by construction, so the LOGICAL changelog is empty — file-level
  rewrites are skipped entirely (Iceberg's changelog scan does the same).

Scale shape: each delta is a column-pruned parquet scan of only the files
ADDED by that snapshot, plus (for merges) a positional semi-join of the
parent scan restricted to the files the new deletes actually reference —
no full-table diff, no driver-side rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moonlink_spark.catalog.metadata import norm_path
from moonlink_spark.table import MoonTable

# operations that rewrite physical layout without changing the row set
_LAYOUT_ONLY_OPS = {"compact", "cluster", "rewrite-manifests", "alter", "expire"}


def scan_changes(
    table: MoonTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Row-level changes committed after *from_snapshot_id* up to and
    including *to_snapshot_id* (default: current). Returns the payload
    columns plus `_change_op` ('I' inserted / 'D' deleted pre-image) and
    `_change_snapshot_id`."""
    meta = table.meta
    snaps = sorted(meta.snapshots, key=lambda s: s.sequence_number)
    by_id = {s.snapshot_id: s for s in snaps}
    if to_snapshot_id is None:
        to_snapshot_id = meta.current_snapshot_id
    if from_snapshot_id not in by_id or to_snapshot_id not in by_id:
        raise KeyError("from/to snapshot not found (expired?)")
    lo = by_id[from_snapshot_id].sequence_number
    hi = by_id[to_snapshot_id].sequence_number
    if hi < lo:
        raise ValueError("to_snapshot precedes from_snapshot")

    cols = columns or [f.name for f in table.schema.fields]
    parts: list[DataFrame] = []

    prev = by_id[from_snapshot_id]
    for s in snaps:
        if not (lo < s.sequence_number <= hi):
            continue
        if s.operation not in _LAYOUT_ONLY_OPS:
            prev_data = table.data_files(prev.snapshot_id)
            prev_files = {norm_path(f.file_path) for f in prev_data}
            prev_dels = {norm_path(d.file_path) for d in table.delete_files(prev.snapshot_id)}
            added_files = [
                f for f in table.data_files(s.snapshot_id)
                if norm_path(f.file_path) not in prev_files
            ]
            added_dels = [
                d for d in table.delete_files(s.snapshot_id)
                if norm_path(d.file_path) not in prev_dels
            ]
            if added_files:
                ins = table._read_data(added_files, with_position=False).select(*cols)
                parts.append(
                    ins.withColumn("_change_op", F.lit("I"))
                    .withColumn("_change_snapshot_id", F.lit(s.snapshot_id).cast("long"))
                )
            if added_dels:
                # _read_deletes applies the expanded-position broadcast gate
                # (broadcast small, force shuffle join when the bitmap
                # expansion is large) — never an unconditional broadcast
                dels = table._read_deletes(added_dels)
                # the new deletes name their target files — scan only those
                targets = {
                    norm_path(r["file_path"])
                    for r in dels.select("file_path").distinct().collect()
                }
                target_files = [
                    f for f in prev_data
                    if norm_path(f.file_path) in targets
                ]
                old = table._read_data(target_files, with_position=True)
                pre_image = old.join(
                    dels,
                    (old["_fp"] == dels["file_path"]) & (old["_pos"] == dels["pos"]),
                    "left_semi",
                ).select(*cols)
                parts.append(
                    pre_image.withColumn("_change_op", F.lit("D"))
                    .withColumn("_change_snapshot_id", F.lit(s.snapshot_id).cast("long"))
                )
        prev = s

    if not parts:
        return _empty(table, cols)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _empty(table: MoonTable, cols: list[str]) -> DataFrame:
    import pyspark.sql.types as T

    schema = T.StructType(
        [f for f in table.schema.fields if f.name in set(cols)]
        + [
            T.StructField("_change_op", T.StringType()),
            T.StructField("_change_snapshot_id", T.LongType()),
        ]
    )
    return table.spark.createDataFrame([], schema)


def scan_changes_at_lsn(
    table: MoonTable,
    from_lsn: int,
    to_lsn: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """LSN-addressed changelog: the row-level changes whose commits became
    visible after *from_lsn* up to *to_lsn* — the CDC-out twin of
    scan_at_lsn (read_state_manager.rs addresses reads the same way). The
    LSNs resolve to snapshots via the same flush-lsn protocol, so a
    downstream consumer can checkpoint a single LSN watermark for both its
    snapshot reads and its change feed."""
    s_from = table.snapshot_for_lsn(from_lsn)
    if s_from is None:
        raise ValueError(f"no snapshot visible at lsn {from_lsn}")
    if to_lsn is None:
        s_to_id = table.current_snapshot_id()
    else:
        s_to = table.snapshot_for_lsn(to_lsn)
        if s_to is None:
            raise ValueError(f"no snapshot visible at lsn {to_lsn}")
        s_to_id = s_to.snapshot_id
    return scan_changes(table, s_from.snapshot_id, s_to_id, columns=columns)
