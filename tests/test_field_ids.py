"""Field-id projection: drop-then-re-add must NOT resurrect old data.

The reference persists PARQUET:field_id per column and projects by id
(iceberg_table_manager.rs:88-89; benches/bench_write.rs:33-45). Without it,
name-based projection reads a re-added column's stale physical values out
of pre-drop files. These tests pin the id-based semantics."""

import pyspark.sql.types as T

from pyspark.sql import functions as F

from moonlink_spark.operators.alter import alter_table
from moonlink_spark.sources.fixtures import create_images_table, generate_images_df


def test_drop_then_readd_reads_null(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, 300, seed=42)
    assert table.scan().filter(F.col("fmt").isNull()).count() == 0

    alter_table(table, drop_columns=["fmt"])
    assert "fmt" not in [f.name for f in table.schema.fields]

    # re-add the SAME name with a fresh field id
    alter_table(table, add_columns=[T.StructField("fmt", T.StringType(), True)])
    got = table.scan(columns=["image_id", "fmt"])
    # pre-drop files must NOT leak their old physical fmt values
    assert got.count() == 300
    assert got.filter(F.col("fmt").isNotNull()).count() == 0


def test_readd_mixes_old_null_with_new_values(spark, tmp_table_root):
    """Files written AFTER the re-add carry real values; pre-drop files read
    NULL — both coexist in one scan."""
    table = create_images_table(spark, tmp_table_root, 200, seed=42)
    alter_table(table, drop_columns=["fmt"])
    alter_table(table, add_columns=[T.StructField("fmt", T.StringType(), True)])

    fresh = generate_images_df(spark, 50, seed=7).withColumn(
        "image_id", F.concat(F.lit("new-"), F.col("image_id"))
    ).withColumn("fmt", F.lit("webp"))
    table.append(fresh, run_id="post-readd")

    got = table.scan(columns=["image_id", "fmt"])
    assert got.count() == 250
    assert got.filter(F.col("fmt") == "webp").count() == 50
    assert got.filter(F.col("fmt").isNull()).count() == 200

    # ids were not reused: the ledger advanced past the original assignment
    meta = table.meta
    assert meta.field_ids["fmt"] > len(table.schema.fields)


def test_added_column_reads_null_on_old_files(spark, tmp_table_root):
    """Plain add-column (no drop): pre-add files project explicit NULL."""
    table = create_images_table(spark, tmp_table_root, 150, seed=42)
    alter_table(table, add_columns=[T.StructField("score", T.IntegerType(), True)])
    got = table.scan(columns=["image_id", "score"])
    assert got.count() == 150
    assert got.filter(F.col("score").isNotNull()).count() == 0
