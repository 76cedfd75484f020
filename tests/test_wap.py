"""Write-audit-publish: a staged append is durable but invisible until
publish flips the current pointer; a failed audit discards the stage and
the sweep reclaims its files; the changelog never shows unpublished
stages."""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.catalog.catalog import CommitConflict
from moonlink_spark.operators.changes import scan_changes
from moonlink_spark.operators.expire import sweep_orphans
from moonlink_spark.sources.fixtures import create_images_table, generate_images_df


def _fresh(spark, n, prefix):
    return generate_images_df(spark, n, seed=99).withColumn(
        "image_id", F.concat(F.lit(prefix), F.col("image_id"))
    )


def test_stage_audit_publish(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 400, seed=42)
    pre = t.current_snapshot_id()
    staged = t.append(_fresh(spark, 100, "wap-"), run_id="s1", stage_only=True)

    # invisible to every reader of the published table...
    assert t.scan().count() == 400
    assert t.current_snapshot_id() == pre
    # ...but auditable by explicit snapshot id
    assert t.scan(snapshot_id=staged).count() == 500
    # and absent from the changelog (nothing published after `pre`)
    assert scan_changes(t, pre).count() == 0

    assert t.publish_snapshot(staged) == staged
    assert t.current_snapshot_id() == staged
    assert t.scan().count() == 500
    # now the changelog reports the published append
    delta = scan_changes(t, pre)
    assert delta.count() == 100
    assert {r["_change_op"] for r in delta.select("_change_op").distinct().collect()} == {"I"}


def test_staged_snapshot_invisible_to_lsn_reads(spark, tmp_table_root):
    """The read-at-LSN protocol must never resolve to an unpublished stage:
    a staged append sits LAST in the snapshot list and would otherwise
    become the 'latest snapshot with flush-lsn <= X' for every X."""
    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.sources.fixtures import generate_changes_df

    t = create_images_table(spark, tmp_table_root, 300, seed=42)
    merge_into(t, generate_changes_df(spark, 300, 60, seed=42), run_id="m1")
    lsn = t.current_flush_lsn()
    published_rows = t.scan().count()

    staged = t.append(_fresh(spark, 50, "wap-"), run_id="s1", stage_only=True)
    assert t.snapshot_for_lsn(10**12).snapshot_id != staged
    assert t.scan_at_lsn(10**12).count() == published_rows
    assert t.current_flush_lsn() == lsn

    t.publish_snapshot(staged)
    # now visible: published history includes the formerly staged snapshot
    assert t.snapshot_for_lsn(10**12).snapshot_id == staged
    assert t.scan_at_lsn(10**12).count() == published_rows + 50


def test_publish_refuses_after_table_moved(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 300, seed=42)
    staged = t.append(_fresh(spark, 50, "wap-"), run_id="s1", stage_only=True)
    t.append(_fresh(spark, 40, "other-"), run_id="a2")  # table moves
    with pytest.raises(CommitConflict):
        t.publish_snapshot(staged)  # would drop a2's files — must refuse
    # state untouched; the stale stage can be discarded
    assert t.scan().count() == 340
    t.discard_staged(staged)
    assert staged not in {s.snapshot_id for s in t.snapshots()}


def test_discard_reclaims_files_and_guards(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 300, seed=42)
    pre_files = {f.file_path for f in t.data_files()}
    staged = t.append(_fresh(spark, 50, "wap-"), run_id="s1", stage_only=True)
    staged_files = {
        f.file_path for f in t.data_files(staged)
    } - pre_files
    assert staged_files

    with pytest.raises(ValueError):
        t.discard_staged(t.current_snapshot_id())  # published: refused

    t.discard_staged(staged)
    removed = sweep_orphans(t, quarantine=False, older_than_seconds=0)
    assert staged_files <= set(removed)
    assert t.scan().count() == 300
