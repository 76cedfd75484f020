"""Rollback: a metadata-only commit restores an earlier snapshot's row set
while preserving history, and the changelog stays total across it (removed
files emit D pre-images, removed deletion vectors restore rows as I)."""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.operators.changes import scan_changes
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.merge import merge_into
from moonlink_spark.operators.rollback import rollback_to
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df

N = 600


def as_sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rollback_restores_rowset_and_keeps_history(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    pre = t.current_snapshot_id()
    base = as_sorted_rows(t.scan(columns=["image_id", "caption", "phash"]))

    merge_into(t, generate_changes_df(spark, N, 120, seed=42), run_id="m1")
    merged_snap = t.current_snapshot_id()
    merged = as_sorted_rows(t.scan(columns=["image_id", "caption", "phash"]))
    assert merged != base

    rb = rollback_to(t, pre, run_id="rb1")
    assert rb == t.current_snapshot_id()
    assert as_sorted_rows(t.scan(columns=["image_id", "caption", "phash"])) == base
    # history preserved: time travel to the rolled-away merge still works
    assert (
        as_sorted_rows(t.scan(snapshot_id=merged_snap, columns=["image_id", "caption", "phash"]))
        == merged
    )
    ops = [s.operation for s in t.snapshots()]
    assert ops[-1] == "rollback" and "merge" in ops
    # metadata-only: no data files were rewritten — the restored state is
    # the ORIGINAL files by path
    assert {f.file_path for f in t.data_files()} == {
        f.file_path for f in t.data_files(pre)
    }


def test_rollback_noop_and_missing_target(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 200, seed=42)
    cur = t.current_snapshot_id()
    assert rollback_to(t, cur) == cur
    assert [s.operation for s in t.snapshots()] == ["append"]
    with pytest.raises(KeyError):
        rollback_to(t, 10**18)


def test_rollback_of_expired_snapshot_rejected(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 200, seed=42)
    pre = t.current_snapshot_id()
    merge_into(t, generate_changes_df(spark, 200, 40, seed=3), run_id="m1")
    merge_into(t, generate_changes_df(spark, 200, 40, seed=4, lsn_start=9_000_000), run_id="m2")
    expire_snapshots(t, retain_last=1)
    with pytest.raises(KeyError):
        rollback_to(t, pre)


def test_changelog_total_across_rollback(spark, tmp_table_root):
    """The rollback snapshot's changelog delta must exactly invert the
    merge's: D for every row the merge net-inserted, I for every pre-image
    it removed — so replaying base + merge-delta + rollback-delta lands on
    the base row set again."""
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    pre = t.current_snapshot_id()
    merge_into(t, generate_changes_df(spark, N, 120, seed=42), run_id="m1")
    merged_snap = t.current_snapshot_id()
    rollback_to(t, pre, run_id="rb1")

    cols = ["image_id", "caption"]
    base = {r["image_id"]: r["caption"] for r in t.scan(snapshot_id=pre, columns=cols).collect()}
    merged = {
        r["image_id"]: r["caption"]
        for r in t.scan(snapshot_id=merged_snap, columns=cols).collect()
    }

    delta = scan_changes(t, merged_snap).select(*cols, "_change_op").collect()
    dels = {(r["image_id"], r["caption"]) for r in delta if r["_change_op"] == "D"}
    ins = {(r["image_id"], r["caption"]) for r in delta if r["_change_op"] == "I"}

    # D rows = exactly what the merge state had beyond/instead-of base
    assert dels == set(merged.items()) - set(base.items())
    # I rows = exactly what base had that merge had removed/overwritten
    assert ins == set(base.items()) - set(merged.items())

    # and the full span base->rollback replays to the base state
    state = dict(base)
    # within a snapshot, apply D before I (an update is D(old)+I(new) on
    # the same key; the changelog contract orders by snapshot, not row)
    for r in sorted(
        scan_changes(t, pre).select(*cols, "_change_op", "_change_snapshot_id").collect(),
        key=lambda r: (r["_change_snapshot_id"], r["_change_op"] != "D"),
    ):
        if r["_change_op"] == "D":
            state.pop(r["image_id"], None)
        else:
            state[r["image_id"]] = r["caption"]
    assert state == base
