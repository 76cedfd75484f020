"""Distributed parquet writer with explicit bin placement, in-pass stats and
per-partition lineage.

Design notes (Spark-first, scale-first):

- Rows carry an explicit integer ``_bin`` column assigned by the *planner*
  (bin-packing for compaction, zkey range for clustering, hash for deletes).
  ``repartition(num_bins, "_bin")`` sends each bin to exactly one reduce task
  (hash partitioning of a single int is deterministic), so output file names
  can be derived from the bin id — no committer rename dance, and a killed
  run resumes at bin granularity.
- The write stage is ``mapInArrow``: each task streams its Arrow record
  batches straight into a pyarrow ParquetWriter (C++), with per-column
  min/max/null stats accumulated by ``pyarrow.compute.min_max`` in the same
  pass — the analog of moonlink computing Iceberg Datum stats from parquet
  footers (reference: parquet_stats_utils.rs:34-120) without a second read.
  Binary image payloads never materialize as Python objects: bytes stay in
  Arrow buffers from the shuffle fetch to the parquet encoder.
- A bin whose lineage record already exists (same run_id) is skipped: writes
  are idempotent at partition granularity (reference intent: WAL replay,
  wal.rs:1117-1334).

On a real cluster ``data_dir`` is a shared filesystem / object store mount;
tasks write directly to it exactly as moonlink's iceberg syncer uploads data
files with concurrency 128 (iceberg_table_syncer.rs:48-52) — here the
concurrency is simply Spark's task parallelism.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from moonlink_spark.catalog.metadata import DataFile

LINEAGE_SCHEMA = (
    "bin int, file_path string, record_count long, file_size_bytes long, stats string"
)

_STATLESS_TYPES = {"binary"}  # no min/max for opaque payload columns


def _json_safe(v):
    if v is None:
        return None
    if isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, bytes):
        return None
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, (np.bool_,)):
            return bool(v)
    except Exception:
        pass
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def write_datafiles(
    df: DataFrame,
    *,
    data_dir: str,
    run_id: str,
    num_bins: int,
    compression: str = "snappy",
    compression_level: int | None = None,
    sort_within: list[str] | None = None,
    lineage_dir: str | None = None,
    file_prefix: str = "",
) -> list[DataFile]:
    """Write *df* (which must carry an int ``_bin`` column) as one parquet
    file per bin under *data_dir*; return DataFile entries with stats.

    Skips bins already recorded under *lineage_dir* (idempotent resume).
    """
    import pyspark.sql.types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    # internal planner columns (underscore-prefixed: _bin, _zkey, ...) are
    # shuffle/sort keys only — never written to the output files
    payload_fields = [f for f in df.schema.fields if not f.name.startswith("_")]
    statless = {f.name for f in payload_fields if f.dataType.typeName() in _STATLESS_TYPES}
    arrow_schema = to_arrow_schema(T.StructType(payload_fields))
    payload_cols = [f.name for f in payload_fields]

    # per-column codecs: opaque binary payloads (images) are already
    # compressed/high-entropy — zstd-4 on them burns the write stage's CPU
    # for ~zero ratio. Binary columns get snappy (near-free, bails fast on
    # incompressible data); the requested codec applies to everything else.
    if compression not in (None, "none", "snappy"):
        codec_by_col = {
            f.name: ("snappy" if f.dataType.typeName() in _STATLESS_TYPES else compression)
            for f in payload_fields
        }
        level_by_col = (
            {
                f.name: compression_level
                for f in payload_fields
                if f.dataType.typeName() not in _STATLESS_TYPES
            }
            if compression_level is not None
            else None
        )
    else:
        codec_by_col = compression
        level_by_col = compression_level

    if lineage_dir:
        os.makedirs(lineage_dir, exist_ok=True)

    part = df.repartition(max(num_bins, 1), "_bin")
    if sort_within:
        part = part.sortWithinPartitions("_bin", *sort_within)

    def _write(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        # attempt-scoped temp suffix: a speculative/zombie attempt of the
        # same task must not share a temp file with the live attempt (only
        # the final atomic rename may race — last complete file wins)
        tmp_suffix = f".inprogress.{TaskContext.get().taskAttemptId()}"
        writers: dict[int, pq.ParquetWriter] = {}
        paths: dict[int, str] = {}
        counts: dict[int, int] = {}
        stats: dict[int, dict] = {}
        skipped: dict[int, dict] = {}

        def _lineage_path(b: int) -> str | None:
            if lineage_dir is None:
                return None
            return os.path.join(lineage_dir, f"bin-{b:05d}.json")

        def _update_stats(st_all: dict, rb: pa.RecordBatch) -> None:
            for name, col in zip(rb.schema.names, rb.columns):
                st = st_all.setdefault(name, {"min": None, "max": None, "null_count": 0})
                st["null_count"] += col.null_count
                if name in statless or col.null_count == len(col) or len(col) == 0:
                    continue
                if pa.types.is_integer(col.type):
                    s = pc.sum(col).as_py()
                    if s is not None:
                        st["sum"] = int(st.get("sum") or 0) + int(s)
                try:
                    mm = pc.min_max(col)
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                    continue
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                if mn is not None and (st["min"] is None or mn < st["min"]):
                    st["min"] = mn
                if mx is not None and (st["max"] is None or mx > st["max"]):
                    st["max"] = mx

        def _emit(rb: pa.RecordBatch, b: int) -> None:
            if b in skipped:
                return
            if b not in writers:
                lp = _lineage_path(b)
                if lp is not None and os.path.exists(lp):
                    with open(lp) as f:
                        skipped[b] = json.load(f)
                    return
                final = os.path.join(data_dir, f"{file_prefix}{run_id}-b{b:05d}.parquet")
                paths[b] = final
                writers[b] = pq.ParquetWriter(
                    final + tmp_suffix,
                    arrow_schema,
                    compression=codec_by_col,
                    compression_level=level_by_col,
                )
                counts[b] = 0
                stats[b] = {}
            writers[b].write_batch(rb)
            counts[b] += len(rb)
            _update_stats(stats[b], rb)

        for batch in batches:
            if len(batch) == 0:
                continue
            bin_idx = batch.schema.get_field_index("_bin")
            binvals = batch.column(bin_idx).to_numpy(zero_copy_only=False)
            payload = batch.select(payload_cols)
            if payload.schema != arrow_schema:
                payload = payload.cast(arrow_schema)
            uniq = np.unique(binvals)
            if len(uniq) == 1:
                _emit(payload, int(uniq[0]))
            else:
                for b in uniq:
                    mask = pa.array(binvals == b)
                    _emit(payload.filter(mask), int(b))

        rows = []
        for b, w in writers.items():
            w.close()
            final = paths[b]
            os.rename(final + tmp_suffix, final)
            size = os.path.getsize(final)
            clean = {
                c: {
                    "min": _json_safe(s["min"]),
                    "max": _json_safe(s["max"]),
                    "null_count": s["null_count"],
                    **({"sum": int(s["sum"])} if s.get("sum") is not None else {}),
                }
                for c, s in stats[b].items()
            }
            rec = {
                "bin": b,
                "file_path": final,
                "record_count": counts[b],
                "file_size_bytes": size,
                "stats": json.dumps(clean),
            }
            lp = _lineage_path(b)
            if lp is not None:
                tmp = lp + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(rec, f)
                os.rename(tmp, lp)
            rows.append(rec)
        rows.extend(skipped.values())
        if not rows:
            return
        out_schema = pa.schema(
            [
                ("bin", pa.int32()),
                ("file_path", pa.string()),
                ("record_count", pa.int64()),
                ("file_size_bytes", pa.int64()),
                ("stats", pa.string()),
            ]
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([int(r["bin"]) for r in rows], pa.int32()),
                pa.array([r["file_path"] for r in rows], pa.string()),
                pa.array([int(r["record_count"]) for r in rows], pa.int64()),
                pa.array([int(r["file_size_bytes"]) for r in rows], pa.int64()),
                pa.array([r["stats"] for r in rows], pa.string()),
            ],
            schema=out_schema,
        )

    lineage_rows = part.mapInArrow(_write, schema=LINEAGE_SCHEMA).collect()
    out = [
        DataFile(
            file_path=r["file_path"],
            record_count=int(r["record_count"]),
            file_size_bytes=int(r["file_size_bytes"]),
            stats=json.loads(r["stats"]),
        )
        for r in lineage_rows
    ]
    out.sort(key=lambda d: d.file_path)
    return out


def write_datafiles_rolling(
    df: DataFrame,
    *,
    data_dir: str,
    run_id: str,
    rows_per_file: int,
    compression: str = "snappy",
    compression_level: int | None = None,
) -> list[DataFile]:
    """SINGLE-PASS ingest writer: no planner bins, no pre-count — each input
    partition streams its Arrow batches into parquet files that ROLL OVER at
    *rows_per_file* (the mem-slice flush threshold, mooncake_table_config.rs
    :159). Used by append so bulk ingest reads its input exactly once
    (the bin-count path needs a df.count() first — the upstream, e.g. a
    generator or a join, would execute twice).

    File names are {run_id}-p{partition}-{seq}; Spark's task-retry semantics
    keep this safe (a re-executed task rewrites the same names via
    .inprogress + rename).
    """
    import pyspark.sql.types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    payload_fields = [f for f in df.schema.fields if not f.name.startswith("_")]
    statless = {f.name for f in payload_fields if f.dataType.typeName() in _STATLESS_TYPES}
    arrow_schema = to_arrow_schema(T.StructType(payload_fields))
    payload_cols = [f.name for f in payload_fields]

    if compression not in (None, "none", "snappy"):
        codec_by_col = {
            f.name: ("snappy" if f.dataType.typeName() in _STATLESS_TYPES else compression)
            for f in payload_fields
        }
        level_by_col = (
            {
                f.name: compression_level
                for f in payload_fields
                if f.dataType.typeName() not in _STATLESS_TYPES
            }
            if compression_level is not None
            else None
        )
    else:
        codec_by_col = compression
        level_by_col = compression_level

    def _write(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt-scoped temp suffix: with speculative execution (or a
        # zombie attempt) two attempts of the same task write the same FINAL
        # name concurrently — each must stream into its own temp file, and
        # only the atomic rename races (last rename wins with a complete
        # file; a shared ".inprogress" would interleave two writers into one
        # corrupt parquet)
        tmp_suffix = f".inprogress.{ctx.taskAttemptId()}"
        seq = 0
        writer = None
        path = ""
        count = 0
        stats: dict = {}
        done: list[dict] = []

        def _update_stats(rb: pa.RecordBatch) -> None:
            for name, col in zip(rb.schema.names, rb.columns):
                st = stats.setdefault(name, {"min": None, "max": None, "null_count": 0})
                st["null_count"] += col.null_count
                if name in statless or col.null_count == len(col) or len(col) == 0:
                    continue
                try:
                    mm = pc.min_max(col)
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                    continue
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                if mn is not None and (st["min"] is None or mn < st["min"]):
                    st["min"] = mn
                if mx is not None and (st["max"] is None or mx > st["max"]):
                    st["max"] = mx

        def _close() -> None:
            nonlocal writer, count, stats
            if writer is None:
                return
            writer.close()
            os.rename(path + tmp_suffix, path)
            done.append(
                {
                    "bin": pid,
                    "file_path": path,
                    "record_count": count,
                    "file_size_bytes": os.path.getsize(path),
                    "stats": json.dumps(
                        {
                            c: {
                                "min": _json_safe(s["min"]),
                                "max": _json_safe(s["max"]),
                                "null_count": s["null_count"],
                            }
                            for c, s in stats.items()
                        }
                    ),
                }
            )
            writer = None
            count = 0
            stats = {}

        for batch in batches:
            if len(batch) == 0:
                continue
            payload = batch.select(payload_cols)
            if payload.schema != arrow_schema:
                payload = payload.cast(arrow_schema)
            off = 0
            while off < len(payload):
                if writer is None:
                    path = os.path.join(
                        data_dir, f"{run_id}-p{pid:05d}-{seq:04d}.parquet"
                    )
                    seq += 1
                    writer = pq.ParquetWriter(
                        path + tmp_suffix,
                        arrow_schema,
                        compression=codec_by_col,
                        compression_level=level_by_col,
                    )
                take = min(len(payload) - off, rows_per_file - count)
                piece = payload.slice(off, take)
                writer.write_batch(piece)
                _update_stats(piece)
                count += take
                off += take
                if count >= rows_per_file:
                    _close()
        _close()
        if not done:
            return
        out_schema = pa.schema(
            [
                ("bin", pa.int32()),
                ("file_path", pa.string()),
                ("record_count", pa.int64()),
                ("file_size_bytes", pa.int64()),
                ("stats", pa.string()),
            ]
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([int(r["bin"]) for r in done], pa.int32()),
                pa.array([r["file_path"] for r in done], pa.string()),
                pa.array([int(r["record_count"]) for r in done], pa.int64()),
                pa.array([int(r["file_size_bytes"]) for r in done], pa.int64()),
                pa.array([r["stats"] for r in done], pa.string()),
            ],
            schema=out_schema,
        )

    lineage_rows = df.mapInArrow(_write, schema=LINEAGE_SCHEMA).collect()
    out = [
        DataFile(
            file_path=r["file_path"],
            record_count=int(r["record_count"]),
            file_size_bytes=int(r["file_size_bytes"]),
            stats=json.loads(r["stats"]),
        )
        for r in lineage_rows
    ]
    out.sort(key=lambda d: d.file_path)
    return out


def num_bins_for(total_bytes: int, target_bytes: int) -> int:
    """How many output files for *total_bytes* of live data at *target_bytes*
    per file (bin-packing bin count)."""
    return max(1, math.ceil(total_bytes / max(target_bytes, 1)))


def hash_bin(col_name: str, num_bins: int):
    """Deterministic, skew-free bin assignment by key hash (used for merge
    insert files and position-delete files)."""
    return F.pmod(F.xxhash64(F.col(col_name)), F.lit(num_bins)).cast("int")


# Above this many excluded paths an IN-literal expression tree becomes a
# driver-side analysis/codegen scale-killer (same class of problem as the
# clustering boundary cutover, clustering._NATIVE_BOUNDARY_MAX) — switch to
# a broadcast anti-join against a victims DataFrame instead.
EXCLUDE_ISIN_MAX = 1_000


def exclude_file_paths(df: DataFrame, paths, col: str = "file_path") -> DataFrame:
    """Rows of *df* whose *col* is NOT one of *paths*.

    Small lists stay a codegen'd ``NOT IN`` literal; large lists (a
    force_full carry-over can name 10^5-10^6 victim files) become a
    broadcast LEFT ANTI join, which is O(|paths|) driver work instead of a
    multi-MB expression tree the analyzer must walk per plan.
    """
    paths = list(paths)
    if len(paths) <= EXCLUDE_ISIN_MAX:
        return df.filter(~F.col(col).isin(paths)) if paths else df
    spark = df.sparkSession
    victims = spark.createDataFrame([(p,) for p in paths], f"{col} string")
    return df.join(F.broadcast(victims), on=col, how="left_anti")
