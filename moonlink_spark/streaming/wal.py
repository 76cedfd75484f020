"""Ingest WAL: every CDC epoch is made durable BEFORE it is applied.

Reference semantics (SURVEY.md §2 row 29): moonlink persists every ingest
event to a write-ahead log before applying it (wal.rs:80-168 append), and
on recovery replays events with lsn above the last persisted table LSN
(wal.rs:1117-1334), truncating the log up to that LSN afterwards. Without
this, the repo's exactly-once story (checkpointed epoch id + merge run_id
lineage) silently assumed the SOURCE files remain replayable — a CDC
drop-directory pruned before a crash-replay lost events.

The Spark-first analog:

- ``wal_append`` writes the epoch's NORMALIZED change batch
  (op, lsn, <table columns>) as parquet under the WAL dir, committed by an
  atomically-renamed sidecar ``batch-<id>.json`` carrying {batch_id,
  max_lsn, rows}. A batch directory without its sidecar is an aborted
  write and is ignored (and reclaimed by the next truncate).
- The ingest loop then merges FROM THE DURABLE COPY (the WAL read-back is
  the authoritative batch — also avoids decoding the source twice), and
  truncates the WAL up to the table's committed flush-lsn.
- ``replay_wal`` is the recovery entry: apply every surviving batch whose
  max_lsn exceeds the table's flush-lsn, in batch order, under the SAME
  ``stream-{batch_id}`` run_id the live loop would have used — a batch
  that did commit before the crash no-ops via the merge's completed-run
  check, a batch that died mid-write resumes its insert lineage.

Truncation follows the reference's LSN contract: a batch whose max lsn is
at or below the committed flush-lsn is considered applied (the flush-lsn
is monotonically clamped by merge, so every merged batch satisfies this).
As in the reference, LSN order is the replay authority — a source that
hands a *later* epoch a *lower* max lsn than an already-committed one
would be truncated unapplied, which is the same contract wal.rs enforces
when it drops events at or below the persisted LSN on recovery.

Recovery protocol after a crash with a pruned source: call
``replay_wal(table, wal_dir)``, then resume streaming NEW files with a
fresh checkpoint — the old checkpoint's in-flight offset references the
pruned files and must not be reused.

Scale: the WAL adds one parquet write + read per epoch, both sized to the
epoch batch (not the table), fully distributed; the sidecar/truncate work
is O(pending batches) driver-side metadata, like the reference's
file-per-segment WAL.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.table import MoonTable

_SIDECAR_SUFFIX = ".json"


def _batch_dir(wal_dir: str, batch_id: int) -> str:
    return os.path.join(wal_dir, f"batch-{batch_id:012d}")


def _sidecars(wal_dir: str) -> list[dict]:
    """Committed WAL batches (sidecar present), in batch order."""
    out = []
    for p in sorted(glob.glob(os.path.join(wal_dir, "batch-*" + _SIDECAR_SUFFIX))):
        with open(p) as f:
            meta = json.load(f)
        meta["_sidecar"] = p
        out.append(meta)
    return out


def wal_append(wal_dir: str, batch_df: DataFrame, batch_id: int) -> str:
    """Persist one epoch's normalized change batch; returns the batch dir.

    The parquet write lands first; the sidecar rename is the commit point
    (wal.rs:80-168's append-then-fsync analog). Idempotent per batch_id: a
    replayed epoch that finds its sidecar already present reuses the
    durable copy instead of rewriting it."""
    os.makedirs(wal_dir, exist_ok=True)
    bdir = _batch_dir(wal_dir, batch_id)
    sidecar = bdir + _SIDECAR_SUFFIX
    if os.path.exists(sidecar):
        return bdir
    # a dir without a sidecar is a previous aborted attempt — overwrite
    batch_df.write.mode("overwrite").parquet(bdir)
    from pyspark.sql import functions as F

    head = batch_df.agg(
        F.count("*").alias("n"), F.max("lsn").alias("mx")
    ).first()
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "batch_id": batch_id,
                "max_lsn": int(head["mx"]) if head["mx"] is not None else 0,
                "rows": int(head["n"]),
            },
            f,
        )
    os.rename(tmp, sidecar)
    return bdir


def wal_read(spark: SparkSession, wal_dir: str, batch_id: int, table_schema) -> DataFrame:
    """Read a durable batch back with the explicit normalized schema."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
            *table_schema.fields,
        ]
    )
    return spark.read.schema(schema).parquet(_batch_dir(wal_dir, batch_id))


def wal_truncate(wal_dir: str, upto_lsn: int) -> int:
    """Drop committed batches whose max_lsn ≤ *upto_lsn* (they are fully
    reflected in the table) and any sidecar-less aborted batch dirs.
    Returns the number of batches removed (wal.rs truncate semantics)."""
    if not os.path.isdir(wal_dir):
        return 0
    removed = 0
    committed = set()
    for meta in _sidecars(wal_dir):
        bdir = _batch_dir(wal_dir, meta["batch_id"])
        committed.add(os.path.basename(bdir))
        if meta["max_lsn"] <= upto_lsn:
            shutil.rmtree(bdir, ignore_errors=True)
            os.unlink(meta["_sidecar"])
            removed += 1
    for p in glob.glob(os.path.join(wal_dir, "batch-*")):
        if os.path.isdir(p) and os.path.basename(p) not in committed:
            shutil.rmtree(p, ignore_errors=True)  # aborted write, pre-sidecar
    return removed


def replay_wal(table: MoonTable, wal_dir: str) -> list[int]:
    """Crash recovery: apply every pending WAL batch (max_lsn above the
    table's committed flush-lsn), oldest first, under the same
    ``stream-{batch_id}`` run_id the live loop uses — committed batches
    no-op, a batch killed mid-merge resumes its lineage
    (wal.rs:1117-1334's replay-above-persisted-LSN). Truncates afterwards;
    returns the replayed batch ids."""
    from moonlink_spark.operators.merge import merge_into

    if not os.path.isdir(wal_dir):
        return []
    applied: list[int] = []
    for meta in _sidecars(wal_dir):
        if meta["max_lsn"] <= table.current_flush_lsn():
            continue
        df = wal_read(table.spark, wal_dir, meta["batch_id"], table.schema)
        merge_into(table, df, run_id=f"stream-{meta['batch_id']}")
        applied.append(meta["batch_id"])
    wal_truncate(wal_dir, table.current_flush_lsn())
    return applied
