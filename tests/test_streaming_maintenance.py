"""Self-maintaining streaming ingest: a MaintenancePolicy inside the CDC
foreachBatch loop triggers incremental clustering when off-curve pressure
crosses its thresholds, so the table stays read-optimized continuously."""

import os

from moonlink_spark.operators.clustering import cluster
from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df
from moonlink_spark.streaming.ingest import MaintenancePolicy, ingest_cdc_dir

N = 500
BY = ["phash", "w", "h"]


def _rows(t):
    return sorted(
        tuple(r) for r in t.scan(columns=["image_id", "caption", "phash"]).collect()
    )


def test_streaming_ingest_self_maintains(spark, tmp_table_root, tmp_path):
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    cluster(t, by=BY, curve="zorder", run_id="z0", target_bytes=64 * 1024)

    # twin table maintained by plain batch merges = the expected row set
    twin_root = os.path.join(str(tmp_path), "twin")
    twin = create_images_table(spark, twin_root, N, seed=42)

    stage = os.path.join(str(tmp_path), "stage")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    b1 = generate_changes_df(spark, N, 100, seed=42)
    b2 = generate_changes_df(spark, N, 80, seed=42, lsn_start=9_000_000)
    b1.coalesce(1).write.parquet(stage)
    b2.coalesce(1).write.parquet(stage, mode="append")
    merge_into(twin, b1, run_id="tm1")
    merge_into(twin, b2, run_id="tm2")

    policy = MaintenancePolicy(cluster_by=BY, max_unclustered_files=1,
                               max_unclustered_bytes=1)
    ingest_cdc_dir(t, stage, ckpt, max_files_per_trigger=1, maintenance=policy)

    assert _rows(t) == _rows(twin)
    # the policy kept the table on-curve: every live file is clustered and
    # at least one incremental cluster commit interleaved with the merges
    assert all(f.cluster_by == "zorder" for f in t.data_files())
    ops = [s.operation for s in t.snapshots()]
    assert "merge" in ops and "cluster" in ops
    incr = [
        s for s in t.snapshots()
        if s.operation == "cluster" and s.summary.get("scope") == "incremental"
    ]
    assert incr, "expected at least one policy-triggered incremental pass"


def test_policy_not_due_is_noop(spark, tmp_table_root):
    t = create_images_table(spark, tmp_table_root, 200, seed=42)
    cluster(t, by=BY, curve="zorder", run_id="z0")
    from moonlink_spark.streaming.ingest import maybe_maintain

    policy = MaintenancePolicy(cluster_by=BY)  # default thresholds: not due
    assert not policy.due(t)
    assert maybe_maintain(t, policy, run_id="noop") is None
    assert [s.operation for s in t.snapshots()] == ["append", "cluster"]


def test_streaming_iceberg_mirror(spark, tmp_table_root, tmp_path):
    """Continuous Iceberg sync: with iceberg_mirror set, every epoch's
    resulting snapshot is exported as a new Iceberg version; after the
    drain the mirror's spec scan equals the table scan, and the mirror
    carries one Iceberg snapshot per exported table snapshot."""
    from moonlink_spark.iceberg import read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata

    t = create_images_table(spark, tmp_table_root, N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    mirror = os.path.join(str(tmp_path), "mirror")
    b1 = generate_changes_df(spark, N, 100, seed=42)
    b2 = generate_changes_df(spark, N, 80, seed=42, lsn_start=9_000_000)
    b1.coalesce(1).write.parquet(stage)
    b2.coalesce(1).write.parquet(stage, mode="append")

    policy = MaintenancePolicy(
        cluster_by=BY, max_unclustered_files=10**9,  # never cluster: sync only
        iceberg_mirror=mirror,
    )
    ingest_cdc_dir(t, stage, ckpt, max_files_per_trigger=1, maintenance=policy)

    meta = load_iceberg_metadata(mirror)
    assert len(meta["snapshots"]) == 2  # one per epoch
    assert meta["current-snapshot-id"] == t.current_snapshot_id()
    ice = read_iceberg_scan(spark, mirror, columns=["image_id", "caption", "phash"])
    native = t.scan(columns=["image_id", "caption", "phash"])
    assert ice.count() == native.count()
    assert ice.exceptAll(native).count() == 0


def test_mirror_pin_rotation(spark, tmp_table_root, tmp_path):
    """A long-running mirror must not accumulate one pin-tag per epoch:
    only the newest mirror_keep_pins export pins survive."""
    t = create_images_table(spark, tmp_table_root, N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    for i, (n, lsn) in enumerate([(60, 1_000), (50, 2_000_000), (40, 4_000_000)]):
        generate_changes_df(spark, N, n, seed=42, lsn_start=lsn).coalesce(1).write.parquet(
            stage, mode="append" if i else "overwrite"
        )
    policy = MaintenancePolicy(
        cluster_by=BY, max_unclustered_files=10**9,
        iceberg_mirror=os.path.join(str(tmp_path), "mirror"),
        mirror_keep_pins=2,
    )
    ingest_cdc_dir(t, stage, os.path.join(str(tmp_path), "ckpt"),
                   max_files_per_trigger=1, maintenance=policy)
    pins = [n for n in t.refs() if n.startswith("iceberg-export-")]
    assert len(pins) == 2  # 3 epochs exported, oldest pin rotated out


def test_mirror_retention_swept_old_version_fails_pinned_survives(
    spark, tmp_table_root, tmp_path
):
    """Round-4 VERDICT item 8 — the mirror-retention trade-off end-to-end:
    after pin rotation (mirror_keep_pins=1), expire + sweep may reclaim
    files an OLD mirror version references — scanning that version through
    the spec reader fails (cleanly, with an error, not wrong rows) — while
    the still-pinned newest version keeps scanning correctly.

    The trade-off only bites when maintenance REWRITES files between
    exports (without a rewrite every old version references a subset of
    the newest version's cumulative file set and stays scannable), so the
    scenario interposes a full optimize between mirror versions."""
    import pytest

    from moonlink_spark.iceberg import export_iceberg, read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata
    from moonlink_spark.operators.expire import expire_snapshots, sweep_orphans
    from moonlink_spark.operators.optimize import optimize

    t = create_images_table(spark, tmp_table_root, N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    mirror = os.path.join(str(tmp_path), "mirror")
    for i, (n, lsn) in enumerate([(80, 1_000), (60, 2_000_000)]):
        generate_changes_df(spark, N, n, seed=42, lsn_start=lsn).coalesce(1).write.parquet(
            stage, mode="append" if i else "overwrite"
        )
    policy = MaintenancePolicy(
        cluster_by=BY, max_unclustered_files=10**9,  # sync only
        iceberg_mirror=mirror, mirror_keep_pins=1,
    )
    ingest_cdc_dir(t, stage, ckpt, max_files_per_trigger=1, maintenance=policy)

    # a full optimize rewrites every data file, then the next mirror
    # version is exported and — as the stream loop would at
    # mirror_keep_pins=1 — the older export pins rotate out
    optimize(t, mode="full", cluster_by=BY, run_id="turnover")
    export_iceberg(t, mirror)
    pins = sorted(
        (sid, name) for name, sid in t.refs().items()
        if name.startswith("iceberg-export-")
    )
    for _, name in pins[:-1]:
        t.drop_tag(name)

    meta = load_iceberg_metadata(mirror)
    sids = [s["snapshot-id"] for s in meta["snapshots"]]
    assert len(sids) == 3
    assert [n for n in t.refs() if n.startswith("iceberg-export-")] == [
        f"iceberg-export-{sids[-1]}"
    ]

    # retention: keep only the pinned newest snapshot, then sweep
    expire_snapshots(t, retain_last=1)
    swept = sweep_orphans(t, quarantine=False, older_than_seconds=0)
    assert swept  # the pre-optimize files really were reclaimed

    # the pinned (newest) mirror version still scans and matches native
    cols = ["image_id", "caption", "phash"]
    ice = read_iceberg_scan(spark, mirror, columns=cols)
    native = t.scan(columns=cols)
    assert ice.count() == native.count()
    assert ice.exceptAll(native).count() == 0

    # an old, pin-rotated mirror version lost files to the sweep: the scan
    # fails with an error — never silently returns a partial result
    with pytest.raises(Exception):
        read_iceberg_scan(spark, mirror, columns=cols, snapshot_id=sids[0]).count()


def test_streaming_mirror_v3_puffin(spark, tmp_table_root, tmp_path):
    """Continuous sync at mirror_format_version=3: each epoch's export
    lands puffin deletion-vector blobs and the v3 mirror's spec scan
    matches the table after the drain."""
    import glob

    from moonlink_spark.iceberg import read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata

    t = create_images_table(spark, tmp_table_root, N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    mirror = os.path.join(str(tmp_path), "mirror")
    for i, (n, lsn) in enumerate([(80, 1_000), (60, 2_000_000)]):
        generate_changes_df(spark, N, n, seed=42, lsn_start=lsn).coalesce(1).write.parquet(
            stage, mode="append" if i else "overwrite"
        )
    policy = MaintenancePolicy(
        cluster_by=BY, max_unclustered_files=10**9,
        iceberg_mirror=mirror, mirror_format_version=3,
    )
    ingest_cdc_dir(t, stage, ckpt, max_files_per_trigger=1, maintenance=policy)

    meta = load_iceberg_metadata(mirror)
    assert meta["format-version"] == 3
    assert len(meta["snapshots"]) == 2
    assert glob.glob(os.path.join(mirror, "data", "*.puffin"))
    cols = ["image_id", "caption", "phash"]
    ice = read_iceberg_scan(spark, mirror, columns=cols)
    native = t.scan(columns=cols)
    assert ice.count() == native.count()
    assert ice.exceptAll(native).count() == 0


def test_policy_defaults_are_coherent():
    """Out-of-the-box, the mirror cannot grow incoherent: coherent
    retention is ON (mirror_keep_versions set) and pin rotation derives
    from it ("auto" → retention releases pins, no count-based rotation
    that could drop a pin for a still-kept mirror version)."""
    p = MaintenancePolicy()
    assert p.mirror_keep_versions == 8
    assert p.mirror_keep_pins == "auto"


def test_streaming_mirror_keep_versions(spark, tmp_table_root, tmp_path):
    """mirror_keep_versions keeps the mirror's metadata and the source
    pins in lockstep: after the drain only the newest K mirror versions
    exist, their pins survive, expired versions' pins are gone, and the
    kept versions scan."""
    from moonlink_spark.iceberg import read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata

    t = create_images_table(spark, tmp_table_root, N, seed=42)
    stage = os.path.join(str(tmp_path), "stage")
    mirror = os.path.join(str(tmp_path), "mirror")
    for i, (n, lsn) in enumerate([(60, 1_000), (50, 2_000_000), (40, 4_000_000)]):
        generate_changes_df(spark, N, n, seed=42, lsn_start=lsn).coalesce(1).write.parquet(
            stage, mode="append" if i else "overwrite"
        )
    # mirror_keep_pins stays at its "auto" default: coherent retention owns
    # the pin lifecycle, no count-based rotation must interfere
    policy = MaintenancePolicy(
        cluster_by=BY, max_unclustered_files=10**9,
        iceberg_mirror=mirror, mirror_keep_versions=2,
    )
    ingest_cdc_dir(t, stage, os.path.join(str(tmp_path), "ckpt"),
                   max_files_per_trigger=1, maintenance=policy)

    meta = load_iceberg_metadata(mirror)
    assert len(meta["snapshots"]) == 2  # 3 epochs, oldest expired in-loop
    kept = {s["snapshot-id"] for s in meta["snapshots"]}
    pins = {
        int(n.rsplit("-", 1)[1])
        for n in t.refs() if n.startswith("iceberg-export-")
    }
    assert pins == kept
    cols = ["image_id", "caption", "phash"]
    ice = read_iceberg_scan(spark, mirror, columns=cols)
    native = t.scan(columns=cols)
    assert ice.count() == native.count()
    assert ice.exceptAll(native).count() == 0
