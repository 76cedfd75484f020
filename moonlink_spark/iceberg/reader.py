"""Independent Iceberg v2 spec reader: consumes ONLY the exported files.

This module never touches the MoonTable catalog — it walks the Iceberg
protocol exactly as an external engine would (version-hint.text →
vN.metadata.json → manifest-list Avro → manifest Avro → parquet scan with
position deletes anti-joined), so a scan through it hash-matching the
native `t.scan()` proves the exported metadata is genuinely
self-describing.

The Avro manifests are decoded by the REFERENCE Java Avro implementation
(avro-1.12.1.jar on Spark's JVM classpath, via the py4j gateway) — an
independent decoder validating our handwritten container bytes — with the
pure-Python decoder as a fallback when no JVM is available.

Scale: the manifest walk is O(files/25k) driver-side metadata (same as any
Iceberg planner); the data scan and the delete anti-join are fully
distributed, with the delete side broadcast only below a positions gate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# broadcast the position-delete relation below this many rows (mirrors the
# expanded-size gate on the native scan path, table.py _read_deletes)
_BROADCAST_DELETE_ROWS = 2_000_000


def read_avro_via_jvm(spark: SparkSession, path: str) -> list:
    """Decode an Avro container file with the Java reference implementation
    (org.apache.avro on Spark's classpath); returns GenericRecord handles."""
    jvm = spark.sparkContext._jvm
    jfile = jvm.java.io.File(path)
    datum = jvm.org.apache.avro.generic.GenericDatumReader()
    reader = jvm.org.apache.avro.file.DataFileReader(jfile, datum)
    out = []
    while reader.hasNext():
        out.append(reader.next())
    reader.close()
    return out


def _manifest_list_entries(spark: SparkSession, path: str) -> list[dict]:
    try:
        return [
            {
                "manifest_path": str(r.get("manifest_path")),
                "content": int(r.get("content")),
                "sequence_number": int(r.get("sequence_number")),
            }
            for r in read_avro_via_jvm(spark, path)
        ]
    except Exception:
        from moonlink_spark.iceberg.avro_io import read_avro_file

        _, _, recs = read_avro_file(path)
        return [
            {
                "manifest_path": r["manifest_path"],
                "content": r["content"],
                "sequence_number": r.get("sequence_number", 0),
            }
            for r in recs
        ]


def _manifest_entries(spark: SparkSession, path: str) -> list[dict]:
    def _opt(v, conv):
        return None if v is None else conv(v)

    def _ids(v):
        return None if v is None else [int(x) for x in v]

    try:
        out = []
        for r in read_avro_via_jvm(spark, path):
            df = r.get("data_file")
            out.append(
                {
                    "status": int(r.get("status")),
                    "sequence_number": _opt(r.get("sequence_number"), int),
                    "content": int(df.get("content")),
                    "file_path": str(df.get("file_path")),
                    "file_format": str(df.get("file_format")),
                    "record_count": int(df.get("record_count")),
                    "equality_ids": _ids(df.get("equality_ids")),
                    "first_row_id": _opt(df.get("first_row_id"), int),
                    "referenced_data_file": _opt(df.get("referenced_data_file"), str),
                    "content_offset": _opt(df.get("content_offset"), int),
                    "content_size_in_bytes": _opt(
                        df.get("content_size_in_bytes"), int
                    ),
                }
            )
        return out
    except Exception:
        from moonlink_spark.iceberg.avro_io import read_avro_file

        _, _, recs = read_avro_file(path)
        return [
            {
                "status": r["status"],
                "sequence_number": r.get("sequence_number"),
                "content": r["data_file"]["content"],
                "file_path": r["data_file"]["file_path"],
                "file_format": r["data_file"].get("file_format", "PARQUET"),
                "record_count": r["data_file"]["record_count"],
                "equality_ids": r["data_file"].get("equality_ids"),
                "first_row_id": r["data_file"].get("first_row_id"),
                "referenced_data_file": r["data_file"].get("referenced_data_file"),
                "content_offset": r["data_file"].get("content_offset"),
                "content_size_in_bytes": r["data_file"].get("content_size_in_bytes"),
            }
            for r in recs
        ]


def load_iceberg_metadata(table_root: str) -> dict:
    """version-hint.text → vN.metadata.json (the file-catalog protocol)."""
    mdir = os.path.join(table_root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as f:
        return json.load(f)


def resolve_schema(meta: dict, snap: dict | None = None) -> dict:
    """The schema a snapshot was written under: its schema-id entry in the
    metadata's schemas list (falling back to current-schema-id). This is
    what makes external time travel read OLD snapshots with their OLD
    column set after schema evolution."""
    sid = (snap or {}).get("schema-id", meta.get("current-schema-id", 0))
    for s in meta.get("schemas", []):
        if s.get("schema-id") == sid:
            return s
    return meta["schemas"][0]


def check_supported(meta: dict, table_root: str) -> None:
    """Up-front validation of the Iceberg feature surface this engine
    consumes — a clear error beats a confusing AnalysisException deep in
    the delete-file read. Unsupported: non-empty partition specs
    (partition pruning semantics would be silently lost). Equality deletes
    (content=2) are rejected by the SCAN path per-entry; import_iceberg
    CONVERTS them to position deletes at adoption instead."""
    if meta.get("format-version") not in (2, 3):
        raise ValueError(
            f"unsupported Iceberg format-version "
            f"{meta.get('format-version')} at {table_root}"
        )
    for spec in meta.get("partition-specs", []):
        if spec.get("fields"):
            raise ValueError(
                f"unsupported: partitioned Iceberg table at {table_root} "
                f"(spec-id {spec.get('spec-id')} has partition fields "
                f"{[f.get('name') for f in spec['fields']]}; only "
                f"unpartitioned tables are supported — identity-partition "
                f"semantics would be silently lost)"
            )


def _reject_equality_deletes(entry: dict, source: str) -> None:
    if entry["content"] == 2:
        raise ValueError(
            f"unsupported: equality-delete file "
            f"{entry['file_path']} in {source} (content=2); only position "
            f"deletes (content=1) are supported"
        )


def puffin_delete_rows(spark: SparkSession, entries: list[dict]) -> DataFrame:
    """Decode v3 Puffin deletion-vector blobs into (_fp, _pos) rows —
    DISTRIBUTED: each executor task reads and CRC-checks only its blobs
    (a 100 TB table's DV set never funnels through the driver)."""
    rows = [
        (
            e["file_path"],
            int(e["content_offset"]),
            int(e["content_size_in_bytes"]),
            e["referenced_data_file"],
        )
        for e in entries
    ]

    def _decode(batches):
        import pyarrow as pa

        from moonlink_spark.iceberg.puffin import dv_blob_positions, read_puffin_blob

        for batch in batches:
            for pp, off, ln, ref in zip(
                batch.column("puffin_path").to_pylist(),
                batch.column("offset").to_pylist(),
                batch.column("length").to_pylist(),
                batch.column("referenced").to_pylist(),
            ):
                pos = dv_blob_positions(read_puffin_blob(pp, off, ln))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([ref] * len(pos)),
                        pa.array(pos.astype("int64")),
                    ],
                    names=["_fp", "_pos"],
                )

    df = spark.createDataFrame(
        rows, "puffin_path string, offset long, length long, referenced string"
    )
    return df.repartition(min(max(len(rows), 1), 64)).mapInArrow(
        _decode, "_fp string, _pos long"
    )


def snapshot_as_of(meta: dict, as_of_ms: int) -> int:
    """Timestamp time travel (the spec's snapshot-log contract): the last
    snapshot whose log entry timestamp-ms ≤ *as_of_ms*."""
    best = None
    for e in meta.get("snapshot-log", []):
        if e["timestamp-ms"] <= as_of_ms:
            best = e["snapshot-id"]
    if best is None:
        raise ValueError(
            f"no snapshot at or before timestamp-ms {as_of_ms} "
            f"(oldest log entry: {meta.get('snapshot-log') or 'none'})"
        )
    return best


def read_iceberg_scan(
    spark: SparkSession,
    table_root: str,
    columns: list[str] | None = None,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """Scan an Iceberg table directory through the spec protocol alone;
    returns the live rows (position deletes applied). Time travel by
    *snapshot_id* or by wall-clock *as_of_ms* (snapshot-log resolution).

    *with_row_ids* (v3 tables only) appends the spec's row-lineage column
    ``_row_id`` = the data file's immutable first_row_id + the row's
    position — derived exactly as a v3 reader must, so a row keeps its id
    across exports that carry its file forward. The per-file id map is
    manifest-cardinality metadata joined broadcast."""
    meta = load_iceberg_metadata(table_root)
    check_supported(meta, table_root)
    if snapshot_id is not None and as_of_ms is not None:
        raise ValueError("pass snapshot_id or as_of_ms, not both")
    if as_of_ms is not None:
        sid = snapshot_as_of(meta, as_of_ms)
    else:
        sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)

    data_paths: list[str] = []
    first_ids: dict[str, int | None] = {}
    delete_paths: list[str] = []
    puffin_entries: list[dict] = []
    n_delete_rows = 0
    for m in _manifest_list_entries(spark, snap["manifest-list"]):
        for e in _manifest_entries(spark, m["manifest_path"]):
            if e["status"] == 2:  # DELETED entry: file no longer live
                continue
            _reject_equality_deletes(e, snap["manifest-list"])
            if e["content"] == 0:
                data_paths.append(e["file_path"])
                first_ids[e["file_path"]] = e.get("first_row_id")
            elif e.get("file_format") == "PUFFIN":
                puffin_entries.append(e)
                n_delete_rows += e["record_count"]
            else:
                delete_paths.append(e["file_path"])
                n_delete_rows += e["record_count"]

    if not data_paths:
        raise ValueError(f"no live data files in snapshot {sid} of {table_root}")
    snap_schema = resolve_schema(meta, snap)
    schema_fields = [f["name"] for f in snap_schema["fields"]]
    cols = columns or schema_fields
    # schema evolution is metadata-only: the snapshot's schema — not the
    # data files — defines the read columns. Reading with the snapshot's
    # schema as the EXPLICIT read schema makes parquet fill columns absent
    # from older files with NULL and ignore physically-present dropped
    # columns, exactly as a spec-compliant reader does (no mergeSchema
    # footer sweep needed).
    import pyspark.sql.types as T

    from moonlink_spark.iceberg.spec import spark_type

    read_schema = T.StructType(
        [
            T.StructField(f["name"], spark_type(f["type"]), not f.get("required"))
            for f in snap_schema["fields"]
        ]
    )
    if with_row_ids:
        missing = sorted(p for p, fid in first_ids.items() if fid is None)
        if missing:
            raise ValueError(
                f"with_row_ids needs v3 row lineage: {len(missing)} data "
                f"file(s) in snapshot {sid} carry no first_row_id "
                f"(first: {missing[0]})"
            )

    df = spark.read.schema(read_schema).parquet(*data_paths)
    if not delete_paths and not puffin_entries and not with_row_ids:
        return df.select(*cols)

    with_pos = df.select(
        *cols,
        F.regexp_replace(F.col("_metadata.file_path"), "^file:", "").alias("_fp"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    if delete_paths or puffin_entries:
        del_parts = []
        if delete_paths:
            del_parts.append(
                spark.read.parquet(*delete_paths).select(
                    F.col("file_path").alias("_fp"), F.col("pos").alias("_pos")
                )
            )
        if puffin_entries:
            del_parts.append(puffin_delete_rows(spark, puffin_entries))
        dels = del_parts[0]
        for part in del_parts[1:]:
            dels = dels.unionByName(part)
        if n_delete_rows <= _BROADCAST_DELETE_ROWS:
            dels = F.broadcast(dels)
        else:
            # force a shuffled-hash anti-join above the gate: the at-rest
            # delete files are small, so Spark's size estimator would
            # otherwise broadcast a relation whose in-memory row count is
            # huge (same rationale as the native scan's expanded-size gate)
            dels = dels.hint("shuffle_hash")
        with_pos = with_pos.join(dels, ["_fp", "_pos"], "left_anti")
    if not with_row_ids:
        return with_pos.select(*cols)
    # file-cardinality metadata: broadcast the (file → first_row_id) map and
    # derive _row_id = first_row_id + position, the v3 inheritance rule
    # (spec: "Row Lineage" — files written without materialized ids inherit
    # from the manifest's first_row_id)
    id_map = F.broadcast(
        spark.createDataFrame(
            [(p, int(fid)) for p, fid in first_ids.items()],
            "_fp string, _first_row_id long",
        )
    )
    return with_pos.join(id_map, "_fp").select(
        *cols, (F.col("_first_row_id") + F.col("_pos")).alias("_row_id")
    )
