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


def cdc_json_schema(table_schema: T.StructType) -> T.StructType:
    """The event schema: op + lsn + the table's columns, with binary
    columns read as base64 STRINGS (JSON has no bytes; the reference's
    converter base64-decodes bytea payloads — we decode after the scan)."""
    fields = [
        T.StructField("op", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
    for f in table_schema.fields:
        dt = T.StringType() if isinstance(f.dataType, T.BinaryType) else f.dataType
        fields.append(T.StructField(f.name, dt, True))
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
        c = F.unbase64(F.col(f.name)) if isinstance(f.dataType, T.BinaryType) else F.col(f.name)
        cols.append(c.alias(f.name))
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
