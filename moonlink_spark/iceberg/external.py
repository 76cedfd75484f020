"""Write a spec-compliant Iceberg v2 table with an arbitrary partition
spec from pre-partitioned Arrow tables — the shape external writers
(Spark/Flink/Trino) produce with bucket/truncate/temporal transforms.

This is the fixture/interop complement of the reader's transform support:
`read_iceberg_scan` must prune these tables from manifest metadata alone,
and this writer lets tests and demos construct them without an external
engine. Data volume is caller-provided Arrow tables (one per partition
tuple), so nothing here is a hot path — the heavy lifting at scale is the
caller's (an engine writes the files; this only records metadata).
"""

from __future__ import annotations

import json
import os

from moonlink_spark.iceberg.avro_io import write_avro_file
from moonlink_spark.iceberg.spec import MANIFEST_FILE_SCHEMA, manifest_entry_schema

# Avro manifest type of a partition VALUE per transform result
_PRIM_AVRO = {
    "string": "string",
    "int": "int",
    "long": "long",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "int",
    "timestamp": "long",
    "timestamptz": "long",
}


def _part_avro_type(transform: str, source_type: str) -> str:
    if transform.startswith("bucket[") or transform in ("year", "month", "day", "hour"):
        return "int"
    # identity / truncate carry the source's representation
    if source_type in _PRIM_AVRO:
        return _PRIM_AVRO[source_type]
    raise ValueError(
        f"cannot derive manifest Avro type for transform {transform!r} "
        f"over source type {source_type!r}"
    )


def write_external_iceberg(
    root: str,
    schema_fields: list[dict],
    spec_fields: list[dict],
    partitions: list[tuple[dict, "object"]],
    snapshot_id: int = 1,
    entries_per_manifest: int | None = None,
) -> str:
    """Write `root` as an Iceberg v2 table: *schema_fields* are Iceberg
    schema-JSON fields (with ids), *spec_fields* the partition-spec fields
    (name/transform/source-id/field-id), *partitions* a list of
    ``(partition_values_by_field_name, pyarrow.Table)`` — one data file is
    written per entry and its manifest entry carries those partition
    values. Returns the metadata.json path."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    schema_json = json.dumps(
        {"type": "struct", "schema-id": 0, "fields": schema_fields}
    )
    type_by_id = {int(f["id"]): f["type"] for f in schema_fields}
    part_avro = [
        {
            "name": f["name"],
            "field-id": int(f["field-id"]),
            "type": _part_avro_type(f["transform"], type_by_id[int(f["source-id"])]),
        }
        for f in spec_fields
    ]

    entries = []
    for i, (pvals, tbl) in enumerate(partitions):
        p = os.path.join(data_dir, f"part-{i:05d}.parquet")
        pq.write_table(tbl, p)
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": dict(pvals),
                    "record_count": tbl.num_rows,
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
        )

    from moonlink_spark.iceberg.spec import field_summaries

    step = entries_per_manifest or max(1, len(entries))
    manifest_descs = []
    for mi in range(0, max(1, len(entries)), step):
        chunk = entries[mi : mi + step]
        mp = os.path.join(mdir, f"manifest-data-{mi // step:03d}.avro")
        size = write_avro_file(
            mp,
            manifest_entry_schema(part_avro),
            chunk,
            metadata={
                "schema": schema_json.encode(),
                "schema-id": b"0",
                "partition-spec": json.dumps(spec_fields).encode(),
                "partition-spec-id": b"0",
                "format-version": b"2",
                "content": b"data",
            },
        )
        manifest_descs.append(
            {
                "manifest_path": mp,
                "manifest_length": size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(chunk),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in chunk
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                # per-manifest field summaries: what lets readers skip the
                # whole manifest file from the manifest list alone
                "partitions": field_summaries(chunk, part_avro),
            }
        )
    ml = os.path.join(mdir, f"snap-{snapshot_id}-1-ext.avro")
    write_avro_file(
        ml,
        MANIFEST_FILE_SCHEMA,
        manifest_descs,
        metadata={
            "format-version": b"2",
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": b"1",
        },
    )
    meta = {
        "format-version": 2,
        "table-uuid": "e" * 36,
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1,
        "last-column-id": max(int(f["id"]) for f in schema_fields),
        "current-schema-id": 0,
        "schemas": [json.loads(schema_json)],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": max(
            [999] + [int(f["field-id"]) for f in spec_fields]
        ),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": 1,
                "timestamp-ms": 1,
                "manifest-list": ml,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": snapshot_id, "timestamp-ms": 1}],
        "metadata-log": [],
    }
    mpath = os.path.join(mdir, "v1.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    return mpath
