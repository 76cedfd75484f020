"""Ingest WAL durability: epochs are persisted before apply and survive
source pruning across a crash (wal.rs:80-168 append, :1117-1334 replay)."""

import glob
import os

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df
from moonlink_spark.streaming.ingest import ingest_cdc_dir
from moonlink_spark.streaming.wal import replay_wal, wal_append, wal_truncate

N = 400


def _rows(t):
    return sorted(
        tuple(r) for r in t.scan(columns=["image_id", "caption", "phash"]).collect()
    )


def _wal_entries(wal_dir):
    return sorted(os.path.basename(p) for p in glob.glob(os.path.join(wal_dir, "batch-*")))


def test_ingest_with_wal_drains_and_truncates(spark, tmp_table_root, tmp_path):
    """The happy path: wal_dir adds durability but changes nothing about
    the result, and a fully-drained backfill leaves an empty WAL."""
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    twin = create_images_table(spark, os.path.join(str(tmp_path), "twin"), N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    wal = os.path.join(str(tmp_path), "wal")
    b1 = generate_changes_df(spark, N, 80, seed=42)
    b2 = generate_changes_df(spark, N, 60, seed=42, lsn_start=9_000_000)
    b1.coalesce(1).write.parquet(stage)
    b2.coalesce(1).write.parquet(stage, mode="append")
    merge_into(twin, b1, run_id="tm1")
    merge_into(twin, b2, run_id="tm2")

    ingest_cdc_dir(t, stage, os.path.join(str(tmp_path), "ckpt"),
                   max_files_per_trigger=1, wal_dir=wal)

    assert _rows(t) == _rows(twin)
    assert _wal_entries(wal) == []  # every epoch committed → truncated


def test_replay_wal_after_source_pruned(spark, tmp_table_root, tmp_path):
    """The crash the WAL exists for: an epoch is persisted, the process
    dies before its merge commits, and the SOURCE files are pruned. Replay
    from the WAL alone must converge to the batch-merge twin."""
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    twin = create_images_table(spark, os.path.join(str(tmp_path), "twin"), N, seed=42)
    wal = os.path.join(str(tmp_path), "wal")
    b0 = generate_changes_df(spark, N, 80, seed=42)
    b1 = generate_changes_df(spark, N, 60, seed=42, lsn_start=9_000_000)
    merge_into(twin, b0, run_id="tm0")
    merge_into(twin, b1, run_id="tm1")

    # epoch 0 completes normally: persist → merge → truncate
    wal_append(wal, b0, 0)
    merge_into(t, b0, run_id="stream-0")
    wal_truncate(wal, t.current_flush_lsn())
    assert _wal_entries(wal) == []

    # epoch 1: persisted, then the process dies before merge; the landing
    # directory the batch came from is pruned (nothing left to re-read)
    wal_append(wal, b1, 1)

    applied = replay_wal(t, wal)
    assert applied == [1]
    assert _rows(t) == _rows(twin)
    assert t.current_flush_lsn() == twin.current_flush_lsn()
    assert _wal_entries(wal) == []  # replay truncates what it applied


def test_replay_wal_skips_committed_batches(spark, tmp_table_root, tmp_path):
    """A batch whose merge DID commit (crash after merge, before truncate)
    is not re-applied — its max_lsn sits at/below the flush-lsn — and
    replay truncates it (the reference drops events ≤ persisted LSN)."""
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    wal = os.path.join(str(tmp_path), "wal")
    b0 = generate_changes_df(spark, N, 50, seed=42)
    wal_append(wal, b0, 0)
    merge_into(t, b0, run_id="stream-0")
    # crash here: truncate never ran
    before = _rows(t)
    snaps_before = len(t.snapshots())

    assert replay_wal(t, wal) == []
    assert _rows(t) == before
    assert len(t.snapshots()) == snaps_before  # no extra commit
    assert _wal_entries(wal) == []


def test_truncate_reclaims_aborted_writes(spark, tmp_table_root, tmp_path):
    """A batch directory without its sidecar is an aborted pre-commit
    write: ignored by replay, reclaimed by truncate."""
    t = create_images_table(spark, tmp_table_root, 100, seed=42)
    wal = os.path.join(str(tmp_path), "wal")
    b0 = generate_changes_df(spark, 100, 20, seed=42)
    # simulate a write that died before the sidecar rename
    b0.coalesce(1).write.parquet(os.path.join(wal, "batch-000000000007"))
    assert replay_wal(t, wal) == []
    assert _wal_entries(wal) == []


def test_wal_append_idempotent(spark, tmp_table_root, tmp_path):
    """A replayed epoch re-persisting the same batch_id reuses the durable
    copy (the sidecar is the commit point)."""
    create_images_table(spark, tmp_table_root, 100, seed=42)
    wal = os.path.join(str(tmp_path), "wal")
    b0 = generate_changes_df(spark, 100, 20, seed=42)
    d1 = wal_append(wal, b0, 3)
    stamp = os.path.getmtime(d1 + ".json")
    d2 = wal_append(wal, b0, 3)
    assert d1 == d2 and os.path.getmtime(d1 + ".json") == stamp
