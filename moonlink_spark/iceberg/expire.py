"""Expire old versions of an Iceberg mirror directory.

A continuously-synced mirror (streaming ingest exports every epoch,
iceberg_table_syncer.rs:723-838 is the reference's identical loop) grows
without bound: every export appends a snapshot, a manifest list, manifests,
and — when the table has DVs — mirror-local delete files (position-delete
parquet or puffin DV blobs). This module is the retention half of that
loop: keep the newest K snapshots, delete mirror-LOCAL files only the
dropped snapshots reference, and commit a pruned metadata version.

The table's own data files are referenced IN PLACE by the mirror and are
NEVER touched here — their lifecycle belongs to the source table's
expire/sweep (which honors the export pin tags). With *source_table*
passed, the pins of expired mirror versions are dropped so the source
sweep can reclaim files no retained mirror version needs.

Scale: everything here is metadata work — O(files/25k) manifest reads and
unlink calls on the driver, like any Iceberg expire_snapshots planner.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from moonlink_spark.iceberg.reader import (
    _manifest_entries,
    _manifest_list_entries,
    load_iceberg_metadata,
)

_RETAIN_METADATA_VERSIONS = 3


def _snapshot_files(spark: SparkSession, snap: dict) -> set[str]:
    """Every file a snapshot references: its manifest list, manifests, and
    all entry file paths (including status=2 tombstones — conservative on
    the live side, complete on the dead side)."""
    files = {snap["manifest-list"]}
    for m in _manifest_list_entries(spark, snap["manifest-list"]):
        files.add(m["manifest_path"])
        for e in _manifest_entries(spark, m["manifest_path"]):
            files.add(e["file_path"])
    return files


def expire_iceberg_mirror(
    spark: SparkSession,
    mirror_root: str,
    keep_last: int = 3,
    source_table=None,
) -> dict:
    """Drop all but the newest *keep_last* mirror snapshots; delete
    mirror-local files (under *mirror_root*) only dropped snapshots
    reference; retire metadata versions beyond the last
    _RETAIN_METADATA_VERSIONS. Returns
    {expired_snapshot_ids, deleted_files, dropped_pins}."""
    meta = load_iceberg_metadata(mirror_root)
    snaps = meta["snapshots"]
    if len(snaps) <= keep_last:
        return {"expired_snapshot_ids": [], "deleted_files": 0, "dropped_pins": []}
    keep, drop = snaps[-keep_last:], snaps[:-keep_last]
    if meta["current-snapshot-id"] not in {s["snapshot-id"] for s in keep}:
        raise ValueError("keep_last would expire the current snapshot")

    live: set[str] = set()
    for s in keep:
        live |= _snapshot_files(spark, s)
    dead: set[str] = set()
    for s in drop:
        dead |= _snapshot_files(spark, s)
    dead -= live

    root_abs = os.path.abspath(mirror_root)
    deleted = 0
    for p in sorted(dead):
        ap = os.path.abspath(p)
        # ONLY mirror-local files: in-place source data files live outside
        if ap.startswith(root_abs + os.sep) and os.path.exists(ap):
            os.unlink(ap)
            deleted += 1

    # pruned metadata version (an Iceberg expire is itself a new commit)
    mdir = os.path.join(mirror_root, "metadata")
    hint_path = os.path.join(mdir, "version-hint.text")
    with open(hint_path) as f:
        version = int(f.read().strip())
    keep_ids = {s["snapshot-id"] for s in keep}
    new_meta = dict(meta)
    new_meta["snapshots"] = keep
    new_meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", []) if e["snapshot-id"] in keep_ids
    ]
    new_meta["metadata-log"] = (meta.get("metadata-log", []) + [
        {
            "metadata-file": os.path.join(mdir, f"v{version}.metadata.json"),
            "timestamp-ms": meta["last-updated-ms"],
        }
    ])[-_RETAIN_METADATA_VERSIONS:]
    new_version = version + 1
    new_path = os.path.join(mdir, f"v{new_version}.metadata.json")
    with open(new_path + ".tmp", "w") as f:
        json.dump(new_meta, f, indent=1)
    os.rename(new_path + ".tmp", new_path)
    with open(hint_path + ".tmp", "w") as f:
        f.write(str(new_version))
    os.rename(hint_path + ".tmp", hint_path)

    # retire metadata versions no retained metadata-log entry references —
    # normalized with abspath on BOTH sides (like the dead-file loop above):
    # metadata-log entries carry whatever root spelling export() was called
    # with, which may differ from this call's (relative vs absolute).
    kept_meta = {os.path.abspath(e["metadata-file"])
                 for e in new_meta["metadata-log"]} | {os.path.abspath(new_path)}
    for n in os.listdir(mdir):
        if n.startswith("v") and n.endswith(".metadata.json"):
            fp = os.path.join(mdir, n)
            if os.path.abspath(fp) not in kept_meta:
                os.unlink(fp)

    dropped_pins: list[str] = []
    if source_table is not None:
        for s in drop:
            tag = f"iceberg-export-{s['snapshot-id']}"
            if tag in source_table.refs():
                source_table.drop_tag(tag)
                dropped_pins.append(tag)

    return {
        "expired_snapshot_ids": [s["snapshot-id"] for s in drop],
        "deleted_files": deleted,
        "dropped_pins": dropped_pins,
    }
