"""JSON-lines CDC event source — the REST-ingest converter analog.

The reference accepts row events over HTTP and converts JSON payloads to
typed rows against the table's DECLARED schema
(rest_ingest/json_converter.rs, 1434 LoC of per-type coercion;
schema_util.rs:75-180 defines the accepted type surface incl. structs).
The Spark-first analog is a file-based event stream: newline-delimited
JSON objects

    {"op": "I"|"U"|"D", "lsn": <long>, <row fields...>}

parsed by Spark's JSON reader against an explicit schema built from the
table's schema — so every coercion (numbers to int/long/double, strings,
booleans, nested structs, base64 for binary) happens JVM-side in one
scan, not in per-row Python. Malformed lines land in a corrupt-record
column and are REJECTED loudly (the converter errors on bad payloads
rather than silently dropping events); unknown ops are rejected the same
way.

Batch (`read_json_cdc`) and streaming (`stream_json_cdc` /
`ingest_cdc_dir(format="json")`) share the schema and validation.

At scale: a JSON drop-directory is exactly how the reference's REST
frontend lands events durably before apply; the parse is embarrassingly
parallel and the downstream is the same MERGE kernel.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, functions as F

_CORRUPT = "_corrupt_record"
_OPS = ("I", "U", "D")


def _read_type(dt: T.DataType) -> T.DataType:
    """Recursively remap BinaryType → StringType (JSON has no bytes) at ANY
    nesting depth — a binary field inside a struct/array/map would otherwise
    hit Spark's JSON reader as-is and land every row in _corrupt_record."""
    if isinstance(dt, T.BinaryType):
        return T.StringType()
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _read_type(f.dataType), f.nullable) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_read_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(_read_type(dt.keyType), _read_type(dt.valueType), dt.valueContainsNull)
    return dt


def _decode_binary(col: F.Column, dt: T.DataType) -> F.Column:
    """Rebuild a value parsed under _read_type back to the table type:
    unbase64 every (possibly nested) binary leaf, preserving null holes."""
    if isinstance(dt, T.BinaryType):
        return F.unbase64(col)
    if isinstance(dt, T.StructType):
        if not any(_has_binary(f.dataType) for f in dt.fields):
            return col
        rebuilt = F.struct(
            *[_decode_binary(col.getField(f.name), f.dataType).alias(f.name) for f in dt.fields]
        )
        return F.when(col.isNull(), F.lit(None).cast(dt)).otherwise(rebuilt)
    if isinstance(dt, T.ArrayType) and _has_binary(dt.elementType):
        return F.transform(col, lambda x: _decode_binary(x, dt.elementType))
    if isinstance(dt, T.MapType):
        if _has_binary(dt.keyType):
            # map KEYS were remapped to base64 strings by _read_type too —
            # rebuild them or the returned type mismatches the table schema
            col = F.transform_keys(col, lambda k, _: _decode_binary(k, dt.keyType))
        if _has_binary(dt.valueType):
            col = F.transform_values(col, lambda _, v: _decode_binary(v, dt.valueType))
        return col
    return col


def _has_binary(dt: T.DataType) -> bool:
    if isinstance(dt, T.BinaryType):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_binary(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _has_binary(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_binary(dt.keyType) or _has_binary(dt.valueType)
    return False


def cdc_json_schema(table_schema: T.StructType) -> T.StructType:
    """The event schema: op + lsn + the table's columns, with binary
    columns — at any nesting depth — read as base64 STRINGS (JSON has no
    bytes; the reference's converter base64-decodes bytea payloads — we
    decode after the scan)."""
    fields = [
        T.StructField("op", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
    for f in table_schema.fields:
        fields.append(T.StructField(f.name, _read_type(f.dataType), True))
    fields.append(T.StructField(_CORRUPT, T.StringType(), True))
    return T.StructType(fields)


def _finish(df: DataFrame, table_schema: T.StructType, strict: bool) -> DataFrame:
    """Shared post-scan validation/coercion for batch + streaming."""
    bad = F.col(_CORRUPT).isNotNull() | ~F.col("op").isin(*_OPS) | F.col("lsn").isNull()
    if strict:
        df = df.withColumn(
            "op",
            F.when(bad, F.raise_error(F.concat(
                F.lit("malformed CDC event: "),
                F.coalesce(F.col(_CORRUPT), F.to_json(F.struct("op", "lsn"))),
            ))).otherwise(F.col("op")),
        )
    else:
        df = df.filter(~bad)
    cols = [F.col("op"), F.col("lsn")]
    for f in table_schema.fields:
        cols.append(_decode_binary(F.col(f.name), f.dataType).alias(f.name))
    return df.select(*cols)


def read_json_cdc(
    spark: SparkSession,
    path: str,
    table_schema: T.StructType,
    strict: bool = True,
) -> DataFrame:
    """Parse a JSONL CDC file/directory into the typed (op, lsn, <row>)
    change DataFrame `merge_into` consumes. *strict* (default) fails the
    job on any malformed line or unknown op; strict=False drops them."""
    raw = (
        spark.read.schema(cdc_json_schema(table_schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _finish(raw, table_schema, strict)


def stream_json_cdc(
    spark: SparkSession,
    path: str,
    table_schema: T.StructType,
    max_files_per_trigger: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """Streaming twin of read_json_cdc (readStream over a drop-dir)."""
    reader = (
        spark.readStream.schema(cdc_json_schema(table_schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _finish(reader.json(path), table_schema, strict)
