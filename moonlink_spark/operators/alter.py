"""Schema evolution: add / drop whole columns.

Mirrors moonlink's AlterTableRequest { new_columns, dropped_columns }
(reference: mooncake_table.rs:100-103,616-651 — add/drop whole columns
only, validated against key columns; persisted as a direct metadata commit,
file_catalog.rs:686-703).

Spark-first: this is a METADATA-ONLY commit — no data files are rewritten.
Scans project through the current schema: files written before an added
column simply lack it and read as null (classic Iceberg add-column
semantics); dropped columns are pruned at scan time by schema projection,
so old files carrying them stay valid. At 10^12-image scale a schema change
therefore costs one catalog CAS, not an exabyte rewrite.
"""

from __future__ import annotations

import json

import pyspark.sql.types as T

from moonlink_spark.table import MoonTable


def alter_table(
    table: MoonTable,
    add_columns: list[T.StructField] | None = None,
    drop_columns: list[str] | None = None,
) -> int:
    """Apply add/drop column changes; returns the new snapshot id.

    Key columns cannot be dropped (reference assert:
    mooncake_table.rs:644-647); added columns must be nullable (rows in
    pre-existing files have no value for them)."""
    add_columns = add_columns or []
    drop_columns = drop_columns or []
    meta, version = table.catalog.load_pinned()
    schema = T.StructType.fromJson(json.loads(meta.schema_json))
    names = {f.name for f in schema.fields}

    for c in drop_columns:
        if c in table.key_columns:
            raise ValueError(f"cannot drop key column {c!r}")
        if c not in names:
            raise ValueError(f"cannot drop unknown column {c!r}")
    for f in add_columns:
        if f.name in names:
            raise ValueError(f"column {f.name!r} already exists")
        if not f.nullable:
            raise ValueError(f"added column {f.name!r} must be nullable")

    new_fields = [f for f in schema.fields if f.name not in set(drop_columns)]
    new_fields.extend(add_columns)
    new_schema = T.StructType(new_fields)

    meta.schema_json = new_schema.json()
    # field-id ledger: drops RETIRE the id (never reused); adds take a fresh
    # one — so a column re-added under a dropped name gets a new id and scans
    # of pre-drop files project NULL instead of the stale physical values
    # (Iceberg field-id semantics; the reference persists PARQUET:field_id,
    # iceberg_table_manager.rs:88-89)
    if not meta.field_ids:  # legacy table: adopt ids for the pre-alter schema
        meta.field_ids = {f.name: i + 1 for i, f in enumerate(schema.fields)}
        meta.next_field_id = len(schema.fields) + 1
    for c in drop_columns:
        meta.field_ids.pop(c, None)
    for f in add_columns:
        meta.field_ids[f.name] = meta.next_field_id
        meta.next_field_id += 1
    table.catalog.commit(meta, expected_version=version)
    # force an (empty-change) snapshot carrying the schema update, mirroring
    # moonlink's "force empty iceberg snapshot w/ schema update"
    # (table_handler.rs:449-467)
    return table.commit_snapshot(
        "alter",
        table.data_files(),
        table.delete_files(),
        summary={
            "added-columns": [f.name for f in add_columns],
            "dropped-columns": list(drop_columns),
        },
    )
