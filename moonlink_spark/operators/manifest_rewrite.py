"""Manifest rewrite: coalesce manifest chunks + refresh per-file stats.

Mirrors moonlink's manifest rewrite at commit (SURVEY.md §2 rows 15, 17, 21:
data_file_manifest_manager.rs rolls manifests at 25k entries; index merge is
moonlink's "merge many small metadata blobs" job — our manifest coalesce is
the direct analog since Spark joins replace hash-file indexes).

Stats recomputation reads parquet FOOTERS only (row-group min/max), as a
distributed Spark job over the file list — the same trick as
parquet_stats_utils.rs:34-120 but fanned out across executors.
"""

from __future__ import annotations

from moonlink_spark.catalog.metadata import MANIFEST_MAX_ENTRIES
from moonlink_spark.catalog.stats import footer_stats
from moonlink_spark.table import MoonTable


def rewrite_manifests(
    table: MoonTable,
    recompute_stats: bool = False,
    max_entries: int = MANIFEST_MAX_ENTRIES,
) -> int:
    """Rewrite the current snapshot's manifests; returns the new snapshot id."""
    files = table.data_files()
    deletes = table.delete_files()
    if recompute_stats and files:
        stats_by_path = footer_stats(table.spark, [f.file_path for f in files])
        for f in files:
            got = stats_by_path.get(f.file_path)
            if got:
                f.stats = got["stats"]
                f.record_count = got["record_count"]
                f.file_size_bytes = got["file_size_bytes"]
    return table.commit_snapshot(
        "rewrite-manifests",
        files,
        deletes,
        summary={
            "manifest-max-entries": max_entries,
            "data-files": len(files),
            "recomputed-stats": bool(recompute_stats),
        },
        # coalesce: regular commits reuse chunks incrementally; THIS job's
        # purpose is to fold accumulated small chunks into full-size ones
        force_rewrite=True,
    )
