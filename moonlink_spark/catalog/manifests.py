"""Chunked manifest files with per-file column stats.

Re-creates moonlink's manifest-rewrite behaviour (reference:
table/iceberg/data_file_manifest_manager.rs:15,54-100 — drop removed files,
attach DV entries, roll over at 25 000 entries per manifest) as plain JSON
manifest chunks. Each chunk is a list of entries; data and delete files live
in separate manifest lists on the Snapshot.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict

from moonlink_spark.catalog.metadata import (
    MANIFEST_MAX_ENTRIES,
    DataFile,
    DeleteFile,
)


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


# Manifest chunks are IMMUTABLE once written (uuid-named, never rewritten in
# place), so parsed entries can be cached by path: without this, every commit
# and every data_files() call re-reads every parent chunk on the driver —
# O(table) metadata reads per commit even though writes are O(delta)
# (at 10^12 files that's the planner bottleneck). The cache stores RAW dicts;
# readers construct fresh dataclasses with nested dicts COPIED (_fresh_entry)
# so callers may mutate any field — scalars (merge bumps deleted_count,
# cluster stamps cluster_by) or nested stats — without corrupting the cache.
# Bounded FIFO: chunk lists are small (≤25k entries each).
_CHUNK_CACHE: dict[str, list[dict]] = {}
_CHUNK_CACHE_MAX = 4096


def _read_chunk(metadata_dir: str, name: str) -> list[dict]:
    path = os.path.join(metadata_dir, name)
    hit = _CHUNK_CACHE.get(path)
    if hit is not None:
        return hit
    with open(path) as f:
        entries = json.load(f)
    if len(_CHUNK_CACHE) >= _CHUNK_CACHE_MAX:
        _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))
    _CHUNK_CACHE[path] = entries
    return entries


def write_data_manifests(
    metadata_dir: str,
    files: list[DataFile],
    max_entries: int = MANIFEST_MAX_ENTRIES,
) -> list[str]:
    """Write data-file manifests, rolled over at *max_entries*; return the
    relative manifest paths."""
    return _write(metadata_dir, "manifest", [asdict(f) for f in files], max_entries)


def write_delete_manifests(
    metadata_dir: str,
    files: list[DeleteFile],
    max_entries: int = MANIFEST_MAX_ENTRIES,
) -> list[str]:
    return _write(metadata_dir, "delete-manifest", [asdict(f) for f in files], max_entries)


def _write(metadata_dir: str, prefix: str, entries: list[dict], max_entries: int) -> list[str]:
    if not entries:
        return []
    mid = uuid.uuid4().hex[:12]
    out: list[str] = []
    for i, chunk in enumerate(_chunks(entries, max_entries)):
        name = f"{prefix}-{mid}-{i:04d}.json"
        path = os.path.join(metadata_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(chunk, f)
        os.rename(tmp, path)
        if len(_CHUNK_CACHE) < _CHUNK_CACHE_MAX:
            _CHUNK_CACHE[path] = chunk  # write-through: fresh chunks are hot
        out.append(name)
    return out


def incremental_reuse(
    metadata_dir: str,
    old_names: list[str],
    new_files: list,
    reader,
) -> tuple[list[str], list]:
    """Plan an O(delta) manifest commit: manifest chunks whose every entry is
    unchanged and still present are REUSED by name; everything else (added
    files + files in touched chunks) is rewritten into fresh chunks.

    This is the scale property moonlink gets from its per-commit manifest
    rewrite hooks (data_file_manifest_manager.rs:54-100): a MERGE that
    touches 0.1% of a 10^12-row table must not rewrite metadata for the
    other 99.9%. Returns (kept_manifest_names, residual_entries_to_write).
    """
    new_by_path = {f.file_path: f for f in new_files}
    kept: list[str] = []
    covered: set[str] = set()
    for name in old_names:
        entries = reader(metadata_dir, [name])
        if not entries:
            continue
        reusable = all(
            e.file_path not in covered and new_by_path.get(e.file_path) == e
            for e in entries
        )
        if reusable:
            kept.append(name)
            covered.update(e.file_path for e in entries)
    residual = [f for f in new_files if f.file_path not in covered]
    return kept, residual


def _fresh_entry(e: dict) -> dict:
    """Copy a cached raw entry so the dataclass never aliases _CHUNK_CACHE:
    nested dicts (stats, field_ids) are copied two levels deep — without
    this a caller doing `f.stats["c"]["max"] = ...` in place would silently
    corrupt the cache for every later reader in the process."""
    out = dict(e)
    for k in ("stats", "field_ids"):
        v = out.get(k)
        if isinstance(v, dict):
            out[k] = {
                kk: (dict(vv) if isinstance(vv, dict) else vv) for kk, vv in v.items()
            }
    return out


def read_data_manifests(metadata_dir: str, manifest_names: list[str]) -> list[DataFile]:
    files: list[DataFile] = []
    for name in manifest_names:
        files.extend(DataFile(**_fresh_entry(e)) for e in _read_chunk(metadata_dir, name))
    return files


def read_delete_manifests(metadata_dir: str, manifest_names: list[str]) -> list[DeleteFile]:
    files: list[DeleteFile] = []
    for name in manifest_names:
        files.extend(DeleteFile(**_fresh_entry(e)) for e in _read_chunk(metadata_dir, name))
    return files
