"""Postgres logical-replication CDC source — wal2json format.

The reference ingests Postgres logical replication directly
(moonlink_connectors/src/pg_replicate/: pgoutput events decoded in
conversions/cdc_event.rs — Insert/Update/Delete per transaction — and
applied by moonlink_sink.rs, which stamps every row in a transaction with
the transaction's FINAL LSN and treats Update as delete+insert). No
database exists in this sandbox, so the Spark-first analog consumes the
other standard logical-decoding output: **wal2json** transaction lines

    {"xid": 123, "nextlsn": "0/16B6B50", "change": [
        {"kind": "insert", "table": "images",
         "columnnames": [...], "columnvalues": [...]},
        {"kind": "update", ..., "oldkeys": {"keynames": [...],
                                             "keyvalues": [...]}},
        {"kind": "delete", ..., "oldkeys": {...}}]}

parsed ENTIRELY JVM-side (one from_json scan; map_from_arrays +
per-column casts; no Python in the row path) into the same (op, lsn,
<row>) change frame `merge_into` consumes:

  - every change in a transaction carries the transaction's LSN
    (moonlink_sink.rs:152-178 final_lsn semantics) parsed from the
    `X/Y` hex pair: (X << 32) | Y;
  - update → op U (the merge kernel already applies it as
    delete+insert, merge.py CDC semantics);
  - delete rows are reconstructed from `oldkeys` (REPLICA IDENTITY
    columns) — non-key columns NULL, exactly what a delete needs;
  - bytea columns arrive in Postgres hex form (`\\x48656c6c6f`) and are
    unhexed (the reference's conversions/hex.rs equivalent);
  - malformed lines / unknown kinds are REJECTED loudly in strict mode
    (json_converter.rs errors on bad payloads rather than dropping).

At 100 TB-scale replay this is an embarrassingly-parallel scan of the
WAL-dump directory; the downstream is the same MERGE kernel as every
other CDC source.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, functions as F

_CORRUPT = "_corrupt_record"
_KINDS = ("insert", "update", "delete")


def wal2json_read_schema() -> T.StructType:
    change = T.StructType(
        [
            T.StructField("kind", T.StringType(), True),
            T.StructField("schema", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("columnnames", T.ArrayType(T.StringType()), True),
            T.StructField("columnvalues", T.ArrayType(T.StringType()), True),
            T.StructField(
                "oldkeys",
                T.StructType(
                    [
                        T.StructField("keynames", T.ArrayType(T.StringType()), True),
                        T.StructField("keyvalues", T.ArrayType(T.StringType()), True),
                    ]
                ),
                True,
            ),
        ]
    )
    return T.StructType(
        [
            T.StructField("xid", T.LongType(), True),
            T.StructField("lsn", T.StringType(), True),
            T.StructField("nextlsn", T.StringType(), True),
            T.StructField("change", T.ArrayType(change), True),
            T.StructField(_CORRUPT, T.StringType(), True),
        ]
    )


def _parse_lsn(col: F.Column) -> F.Column:
    """Postgres LSN text `X/Y` (two hex halves) → 64-bit long."""
    hi = F.conv(F.split(col, "/").getItem(0), 16, 10).cast("long")
    lo = F.conv(F.split(col, "/").getItem(1), 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def _cast_value(raw: F.Column, dt: T.DataType) -> F.Column:
    if isinstance(dt, T.BinaryType):
        # Postgres hex bytea: \x<hex-digits>
        return F.unhex(F.regexp_replace(raw, r"^\\x", ""))
    # Spark's boolean cast already accepts Postgres 't'/'f' text
    return raw.cast(dt)


def read_wal2json(
    spark: SparkSession,
    path: str,
    table_schema: T.StructType,
    table: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Parse wal2json transaction lines under *path* into the typed
    (op, lsn, <row>) change DataFrame `merge_into` consumes. *table*
    filters multi-table streams to one table's changes; *strict*
    (default) fails on malformed lines, missing LSNs, or unknown kinds."""
    raw = (
        spark.read.schema(wal2json_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _finish(raw, table_schema, table, strict)


def stream_wal2json(
    spark: SparkSession,
    path: str,
    table_schema: T.StructType,
    table: str | None = None,
    max_files_per_trigger: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """Streaming twin of read_wal2json (readStream over a WAL drop-dir) —
    the shape of the reference's live replication loop
    (replication_connection.rs feeds cdc_event.rs continuously)."""
    reader = (
        spark.readStream.schema(wal2json_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _finish(reader.json(path), table_schema, table, strict)


def _finish(
    raw: DataFrame,
    table_schema: T.StructType,
    table: str | None,
    strict: bool,
) -> DataFrame:
    """Shared batch/streaming transformation: guard → explode → typed row."""
    lsn_text = F.coalesce(F.col("lsn"), F.col("nextlsn"))
    malformed = F.col(_CORRUPT).isNotNull()
    no_lsn = ~malformed & lsn_text.isNull()
    change_col = F.col("change")
    if strict:
        # the guard must ride the SAME column the downstream evaluates —
        # a corrupt row has change=NULL and explode() would silently drop
        # it before any other column's raise_error could fire
        change_col = (
            F.when(
                malformed,
                F.raise_error(
                    F.concat(
                        F.lit("malformed wal2json line: "),
                        F.coalesce(F.col(_CORRUPT), F.lit("<empty>")),
                    )
                ).cast(wal2json_read_schema()["change"].dataType),
            )
            .when(
                no_lsn,
                F.raise_error(F.lit(
                    "wal2json line without lsn/nextlsn (enable include-lsn)"
                )).cast(wal2json_read_schema()["change"].dataType),
            )
            .otherwise(F.col("change"))
        )
    else:
        raw = raw.filter(~malformed & ~no_lsn)

    ch = raw.select(
        _parse_lsn(lsn_text).alias("lsn"), F.explode(change_col).alias("c")
    )
    if table is not None:
        ch = ch.filter(F.col("c.table") == table)

    kind = F.col("c.kind")
    op = (
        F.when(kind == "insert", F.lit("I"))
        .when(kind == "update", F.lit("U"))
        .when(kind == "delete", F.lit("D"))
    )
    if strict:
        op = F.when(
            ~kind.isin(*_KINDS),
            F.raise_error(F.concat(F.lit("unknown wal2json kind: "), kind)),
        ).otherwise(op)

    vals = F.map_from_arrays(F.col("c.columnnames"), F.col("c.columnvalues"))
    okeys = F.map_from_arrays(
        F.col("c.oldkeys.keynames"), F.col("c.oldkeys.keyvalues")
    )
    # PK-changing UPDATE: wal2json ships oldkeys on updates precisely so the
    # consumer can retire the OLD key's row. The reference applies update as
    # delete(old)+insert(new) (moonlink_sink.rs); mirroring that, when any
    # replica-identity key value differs from the new row's we emit an extra
    # D row built from oldkeys at the same LSN. The merge kernel's same-LSN
    # tie-break (non-delete wins) makes a false-positive detection harmless:
    # D and U on the SAME key at the same LSN still resolve to the U row.
    knames = F.col("c.oldkeys.keynames")
    pk_changed = (
        (kind == "update")
        & knames.isNotNull()
        & F.exists(
            knames,
            lambda k: ~F.element_at(vals, k).eqNullSafe(F.element_at(okeys, k)),
        )
    )
    ch = ch.withColumn(
        "_emit",
        F.explode(
            F.when(pk_changed, F.array(F.lit("old_del"), F.lit("main")))
            .otherwise(F.array(F.lit("main")))
        ),
    )
    old_del = F.col("_emit") == "old_del"
    op = F.when(old_del, F.lit("D")).otherwise(op)
    use_oldkeys = (kind == "delete") | old_del
    cols = [op.alias("op"), F.col("lsn")]
    for f in table_schema.fields:
        raw_val = F.when(use_oldkeys, okeys[f.name]).otherwise(vals[f.name])
        cols.append(_cast_value(raw_val, f.dataType).alias(f.name))
    return ch.select(*cols)
