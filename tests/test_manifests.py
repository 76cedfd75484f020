"""Incremental manifest commits: O(delta) metadata writes, chunk sharing
across snapshots, coalesce via rewrite_manifests, GC of unreferenced chunks.
"""

import os

import pyspark.sql.types as T

from pyspark.sql import functions as F

from moonlink_spark.operators.expire import expire_snapshots, sweep_orphans
from moonlink_spark.operators.manifest_rewrite import rewrite_manifests
from moonlink_spark.table import MoonTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _mk(spark, root, props=None):
    return MoonTable.create(spark, root, SCHEMA, key_columns=["k"], properties=props)


def _append(spark, t, lo, hi, files):
    # the single-pass rolling writer emits one file per non-empty input
    # partition (rolling at rows_per_file within each) — pin the file count
    # via explicit partitioning, which is how a planner controls layout
    df = spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    t.append(df.repartition(files), rows_per_file=1 << 20)


def test_append_reuses_parent_chunks(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, props={"manifest.max-entries": "4"})
    _append(spark, t, 0, 400, files=8)  # 8 files -> 2 chunks of 4
    m1 = set(t.meta.current_snapshot().manifests)
    assert len(m1) == 2
    _append(spark, t, 400, 500, files=2)  # +2 files
    snap2 = t.meta.current_snapshot()
    m2 = set(snap2.manifests)
    # both full parent chunks are reused by name; only the delta is new
    assert m1 <= m2
    assert len(m2 - m1) == 1
    assert len(t.data_files()) == 10


def test_rewrite_manifests_coalesces(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, props={"manifest.max-entries": "4"})
    for i in range(4):
        _append(spark, t, i * 10, (i + 1) * 10, files=1)  # 4 single-file commits
    assert len(t.meta.current_snapshot().manifests) == 4
    rewrite_manifests(t)
    assert len(t.meta.current_snapshot().manifests) == 1
    assert len(t.data_files()) == 4
    assert t.scan().count() == 40


def test_manifest_gc_keeps_shared_chunks(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, props={"manifest.max-entries": "4"})
    _append(spark, t, 0, 400, files=8)
    _append(spark, t, 400, 500, files=2)
    live = set(t.meta.current_snapshot().manifests)
    expire_snapshots(t, retain_last=1)
    sweep_orphans(t, quarantine=False, older_than_seconds=0)
    on_disk = {
        n
        for n in os.listdir(t.catalog.metadata_dir)
        if n.startswith("manifest-") and n.endswith(".json")
    }
    # every chunk the current snapshot references survives; nothing else does
    assert on_disk == live
    assert t.scan().count() == 500


def test_chunk_cache_immune_to_caller_mutation(spark, tmp_table_root):
    """Manifest readers must hand out dataclasses whose NESTED dicts are
    copies, not aliases of the in-process chunk cache: an in-place
    f.stats[...] mutation by one caller must never leak into what a later
    reader sees."""
    from moonlink_spark.catalog.manifests import read_data_manifests

    t = _mk(spark, tmp_table_root)
    _append(spark, t, 0, 100, files=2)
    names = t.meta.current_snapshot().manifests
    first = read_data_manifests(t.catalog.metadata_dir, names)
    target = first[0]
    assert target.stats, "fixture should carry column stats"
    col = next(iter(target.stats))
    before = target.stats[col]["max"]
    target.stats[col]["max"] = "CORRUPTED"
    target.stats["__new_col__"] = {"min": 0, "max": 0, "null_count": 0}

    again = read_data_manifests(t.catalog.metadata_dir, names)
    fresh = next(f for f in again if f.file_path == target.file_path)
    assert fresh.stats[col]["max"] == before
    assert "__new_col__" not in fresh.stats


def test_distributed_sweep_lists_in_executors(spark, tmp_table_root, monkeypatch):
    """Above the driver listing cap the sweep must switch to the sharded
    executor-side listing and still remove exactly the orphans."""
    import moonlink_spark.operators.expire as ex

    t = _mk(spark, tmp_table_root)
    _append(spark, t, 0, 200, files=4)
    # plant orphans: files on disk that no snapshot references
    orphans = []
    for i in range(6):
        p = os.path.join(t.catalog.data_dir, f"orphan-{i}.parquet")
        with open(p, "wb") as f:
            f.write(b"junk")
        orphans.append(p)

    monkeypatch.setattr(ex, "_DRIVER_SWEEP_MAX", 3)  # force the overflow path
    monkeypatch.setattr(ex, "_LIST_SHARDS", 8)
    acted = sweep_orphans(t, quarantine=False, older_than_seconds=0)
    assert sorted(acted) == sorted(orphans)
    for p in orphans:
        assert not os.path.exists(p)
    assert t.scan().count() == 200  # live files untouched


def test_distributed_sweep_audit_capped_not_collected(spark, tmp_table_root, monkeypatch):
    """Round-4 VERDICT item: on the distributed path the driver receives
    only a CAPPED audit sample — every orphan is still removed, but the
    full path list never materializes on the driver."""
    import moonlink_spark.operators.expire as ex

    t = _mk(spark, tmp_table_root)
    _append(spark, t, 0, 100, files=2)
    orphans = []
    for i in range(9):
        p = os.path.join(t.catalog.data_dir, f"orphan-{i}.parquet")
        with open(p, "wb") as f:
            f.write(b"junk")
        orphans.append(p)

    monkeypatch.setattr(ex, "_DRIVER_SWEEP_MAX", 3)   # force distributed path
    monkeypatch.setattr(ex, "_LIST_SHARDS", 4)
    monkeypatch.setattr(ex, "_AUDIT_SAMPLE_MAX", 4)   # cap below orphan count

    acted = sweep_orphans(t, quarantine=False, older_than_seconds=0)
    # audit output is capped...
    assert len(acted) <= 4
    assert set(acted) <= set(orphans)
    # ...but the mutation pass still removed EVERY orphan
    for p in orphans:
        assert not os.path.exists(p)
    assert t.scan().count() == 100
