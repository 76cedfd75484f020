"""Apache Iceberg v2 format schemas + converters (public spec).

Everything here is from the public Iceberg table spec: the manifest-list
and manifest Avro schemas with their reserved field-ids, the single-value
binary serialization for column bounds, the position-delete file schema
(reserved ids 2147483546/2147483545), and Spark-type → Iceberg-type
conversion for the table-schema JSON and the name-mapping property.
"""

from __future__ import annotations

import struct

import pyspark.sql.types as T

# reserved field ids for position-delete files (Iceberg spec "Position
# Delete Files"); the reference persists the same shape as puffin DV blobs
# (table/iceberg/deletion_vector.rs:16-30)
POS_DELETE_FILE_PATH_ID = 2147483546
POS_DELETE_POS_ID = 2147483545


# --------------------------------------------------------------- avro schemas
def _kv_bytes_map(key_id: int, value_id: int) -> dict:
    """Iceberg's int-keyed bytes map: Avro maps require string keys, so the
    spec encodes these as array<record{key,value}> with logicalType map."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": f"k{key_id}_v{value_id}",
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "bytes", "field-id": value_id},
            ],
        },
    }


FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"], "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"], "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"], "default": None, "field-id": 511},
    ],
}

# manifest-list entry (spec "Manifest Lists"; field names as the Iceberg
# Java v2 writer emits them, ids per the spec table)
MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": FIELD_SUMMARY, "element-id": 508}],
            "default": None,
            "field-id": 507,
        },
    ],
}


def manifest_entry_schema(partition_fields: list[dict] | None = None) -> dict:
    """manifest_entry schema: by default an UNPARTITIONED table (empty r102
    partition struct), v2 fields + the bounds maps used for file pruning.
    *partition_fields* (each ``{"name", "field-id", "type"}`` with an Avro
    type, nullable union applied here) extends r102 for partitioned tables
    — the spec stores one partition VALUE per data file in the manifest,
    which is what makes manifest-level partition pruning metadata-only."""
    part_fields = [
        {
            "name": f["name"],
            "type": ["null", f["type"]],
            "default": None,
            "field-id": f["field-id"],
        }
        for f in (partition_fields or [])
    ]
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": part_fields},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "lower_bounds",
                "type": ["null", _kv_bytes_map(126, 127)],
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": ["null", _kv_bytes_map(129, 130)],
                "default": None,
                "field-id": 128,
            },
            # equality-delete key ids (content=2 entries; spec field 135)
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int", "element-id": 136}],
                "default": None,
                "field-id": 135,
            },
            # v3 row lineage (optional, null for v2 entries): the id
            # assigned to this data file's first row — IMMUTABLE across
            # exports (spec field 142); readers derive row ids as
            # first_row_id + position
            {
                "name": "first_row_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 142,
            },
            # v3 deletion-vector fields (optional, null for v2 entries):
            # the puffin blob a DV entry points into
            {
                "name": "referenced_data_file",
                "type": ["null", "string"],
                "default": None,
                "field-id": 143,
            },
            {
                "name": "content_offset",
                "type": ["null", "long"],
                "default": None,
                "field-id": 144,
            },
            {
                "name": "content_size_in_bytes",
                "type": ["null", "long"],
                "default": None,
                "field-id": 145,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


# ----------------------------------------------------- type conversion
def iceberg_type(dt: T.DataType):
    """Spark type → Iceberg schema-JSON type (nested types supported)."""
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    raise ValueError(f"unsupported Spark type for Iceberg export: {dt}")


def iceberg_type_with_ids(dt: T.DataType, field_ids: dict[str, int], path: str):
    """Spark type → Iceberg schema-JSON type carrying the ledger's ids for
    nested slots (struct fields, list element-id, map key-id/value-id)."""
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": iceberg_schema_fields(dt, field_ids, [], path + "."),
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": int(field_ids[path + ".element"]),
            "element": iceberg_type_with_ids(
                dt.elementType, field_ids, path + ".element"
            ),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": int(field_ids[path + ".key"]),
            "key": iceberg_type_with_ids(dt.keyType, field_ids, path + ".key"),
            "value-id": int(field_ids[path + ".value"]),
            "value": iceberg_type_with_ids(dt.valueType, field_ids, path + ".value"),
            "value-required": not dt.valueContainsNull,
        }
    return iceberg_type(dt)


def spark_type(t) -> T.DataType:
    """Iceberg schema-JSON type → Spark type (inverse of iceberg_type)."""
    if isinstance(t, dict):
        if t.get("type") == "struct":
            return T.StructType(
                [
                    T.StructField(f["name"], spark_type(f["type"]), not f.get("required"))
                    for f in t["fields"]
                ]
            )
        if t.get("type") == "list":
            return T.ArrayType(
                spark_type(t["element"]), not t.get("element-required")
            )
        if t.get("type") == "map":
            return T.MapType(
                spark_type(t["key"]),
                spark_type(t["value"]),
                not t.get("value-required"),
            )
        raise ValueError(f"unsupported Iceberg type: {t}")
    mapping = {
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
        "timestamptz": T.TimestampType(),
        # external tables: the spec's naive timestamp (isAdjustedToUTC=false)
        "timestamp": T.TimestampNTZType(),
    }
    if t in mapping:
        return mapping[t]
    if isinstance(t, str) and t.startswith("decimal("):
        p, s = t[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    raise ValueError(f"unsupported Iceberg type: {t!r}")


def iceberg_schema_fields(
    schema: T.StructType,
    field_ids: dict[str, int],
    key_columns: list[str],
    prefix: str = "",
) -> list[dict]:
    """Iceberg schema-JSON fields with ids from the DOTTED-PATH ledger;
    struct columns recurse so nested fields carry their own ids."""
    out = []
    for f in schema.fields:
        path = prefix + f.name
        out.append(
            {
                "id": int(field_ids[path]),
                "name": f.name,
                "required": path in key_columns or (prefix == "" and not f.nullable),
                "type": iceberg_type_with_ids(f.dataType, field_ids, path),
            }
        )
    return out


def name_mapping(
    schema: T.StructType, field_ids: dict[str, int], prefix: str = ""
) -> list[dict]:
    """schema.name-mapping.default: lets Iceberg readers resolve columns in
    parquet files written WITHOUT field-ids (the spec's sanctioned path for
    imported/add_files data — exactly our in-place data files). Nested
    struct fields map recursively via their dotted-path ids."""
    out = []
    for f in schema.fields:
        path = prefix + f.name
        entry: dict = {"field-id": int(field_ids[path]), "names": [f.name]}
        sub = _nested_mapping(f.dataType, field_ids, path)
        if sub:
            entry["fields"] = sub
        out.append(entry)
    return out


def _nested_mapping(dt: T.DataType, field_ids: dict[str, int], path: str) -> list[dict]:
    """Name-mapping child entries: struct fields by name, list `element`,
    map `key`/`value` (the spec's canonical names for those slots)."""
    if isinstance(dt, T.StructType):
        return name_mapping(dt, field_ids, path + ".")
    out = []
    if isinstance(dt, T.ArrayType):
        slots = [("element", dt.elementType)]
    elif isinstance(dt, T.MapType):
        slots = [("key", dt.keyType), ("value", dt.valueType)]
    else:
        return out
    for name, child in slots:
        p = f"{path}.{name}"
        entry: dict = {"field-id": int(field_ids[p]), "names": [name]}
        sub = _nested_mapping(child, field_ids, p)
        if sub:
            entry["fields"] = sub
        out.append(entry)
    return out


# ------------------------------------------- single-value serialization
def bound_bytes(dt: T.DataType, v) -> bytes | None:
    """Iceberg single-value binary serialization (spec Appendix D) for the
    types our stats carry; None for types we don't serialize bounds for.
    Temporal stats arrive as the catalog's ISO strings and serialize to
    the spec's integer forms (days / micros, little-endian)."""
    if v is None:
        return None
    if isinstance(dt, T.StringType):
        return str(v).encode("utf-8")
    if isinstance(dt, T.LongType):
        return struct.pack("<q", int(v))
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return struct.pack("<i", int(v))
    if isinstance(dt, T.DoubleType):
        return struct.pack("<d", float(v))
    if isinstance(dt, T.FloatType):
        return struct.pack("<f", float(v))
    if isinstance(dt, T.BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(dt, T.DateType):
        from moonlink_spark.iceberg.transforms import _to_days

        return struct.pack("<i", _to_days(v))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        from moonlink_spark.iceberg.transforms import _to_micros

        return struct.pack("<q", _to_micros(v))
    return None


def decode_bound(itype: str, b: bytes):
    """Inverse of the Appendix-D single-value serialization, keyed by the
    Iceberg schema-JSON type (temporal types stay in their integer forms —
    days / micros — matching apply_transform's identity normalization)."""
    if b is None:
        return None
    b = bytes(b)
    if itype == "string":
        return b.decode("utf-8")
    if itype == "long":
        return struct.unpack("<q", b)[0]
    if itype == "int":
        return struct.unpack("<i", b)[0]
    if itype == "double":
        return struct.unpack("<d", b)[0]
    if itype == "float":
        return struct.unpack("<f", b)[0]
    if itype == "boolean":
        return b != b"\x00"
    if itype == "date":
        return struct.unpack("<i", b)[0]
    if itype.startswith("timestamp"):
        return struct.unpack("<q", b)[0]
    return None  # types we don't prune on (binary, decimal, nested)


def partition_value_bytes(avro_type: str, v) -> bytes | None:
    """Appendix-D serialization of a PARTITION value, keyed by its Avro
    manifest type (the field_summary lower/upper_bound encoding)."""
    if v is None:
        return None
    if avro_type == "string":
        return str(v).encode("utf-8")
    if avro_type == "long":
        return struct.pack("<q", int(v))
    if avro_type == "int":
        return struct.pack("<i", int(v))
    if avro_type == "double":
        return struct.pack("<d", float(v))
    if avro_type == "float":
        return struct.pack("<f", float(v))
    if avro_type == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported partition value type {avro_type!r}")


def field_summaries(entries: list[dict], part_avro_fields: list[dict]) -> list[dict] | None:
    """Manifest-list field_summary records (spec field 507) for one
    manifest's entries: per spec field, contains_null + Appendix-D
    lower/upper bounds over the entries' partition values — what lets a
    reader skip the whole manifest FILE before opening it."""
    if not part_avro_fields:
        return None
    out = []
    for pf in part_avro_fields:
        vals = [
            (e.get("data_file") or {}).get("partition", {}).get(pf["name"])
            for e in entries
        ]
        nonnull = [v for v in vals if v is not None]
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": partition_value_bytes(pf["type"], min(nonnull))
                if nonnull
                else None,
                "upper_bound": partition_value_bytes(pf["type"], max(nonnull))
                if nonnull
                else None,
            }
        )
    return out
