"""Initial copy → CDC stream handoff.

Reference semantics (pg_replicate/initial_copy.rs:1-219,
pg_replicate.rs:240-310): bringing an EXISTING populated source table
under replication means (1) export a consistent snapshot and note its
boundary LSN L0 (`export_snapshot_and_lsn`), (2) bulk-copy the snapshot
rows into the table, (3) mark the replication state at L0
(`commit_lsn_tx.mark(progress.boundary_lsn)`) and apply the WAL stream
strictly from there — events at or below L0 are already reflected in the
copy and must be DISCARDED ("we can check where our initial copy started
from and discard any rows we have already seen"), events above L0 apply
exactly once. Any gap loses writes; any overlap re-applies stale
updates/deletes over newer copy state.

The Spark-first analog:

- ``initial_copy`` bulk-appends the snapshot DataFrame (the result of
  scanning the source at snapshot isolation — here any DataFrame the
  caller captured consistently) into a fresh MoonTable, committing with
  ``flush-lsn = L0`` so read-at-LSN and the CDC merge clamp share one LSN
  axis with the copy from the very first snapshot. The copy itself is one
  distributed rolling parquet write — the analog of the reference's
  sharded CTID readers feeding parquet writers, with Spark supplying the
  sharding.
- ``start_cdc_stream(..., since_lsn=L0)`` (streaming/ingest.py) applies
  the boundary filter at the stream edge, JVM-side, before any epoch is
  formed — re-delivered pre-copy events never reach the merge kernel, in
  whatever epoch order the landing files replay them.

Property (tests/test_bootstrap.py, driver query initial_copy_then_cdc):
for ANY split point L0, copy-at-L0 + stream-from-L0 over the full event
log equals the full LWW replay — no gap, no duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.table import MoonTable


def initial_copy(
    spark: SparkSession,
    source_df: DataFrame,
    root: str,
    key_columns: list[str],
    boundary_lsn: int,
    run_id: str = "initial-copy",
    rows_per_file: int = 131_072,
) -> MoonTable:
    """Create *root* as a MoonTable holding *source_df* — a consistent
    snapshot of the source captured at *boundary_lsn* — and stamp the
    commit with that flush-lsn. Attach the CDC stream afterwards with
    ``since_lsn=boundary_lsn`` (or ``table.current_flush_lsn()``, which
    now equals it) to complete the handoff."""
    t = MoonTable.create(spark, root, source_df.schema, key_columns=key_columns)
    t.append(source_df, run_id=run_id, rows_per_file=rows_per_file,
             flush_lsn=boundary_lsn)
    return t
