"""Streaming CDC ingest (micro-batch MERGE) + schema evolution tests."""

import os

import pytest

from pyspark.sql import functions as F
import pyspark.sql.types as T

from moonlink_spark.operators.alter import alter_table
from moonlink_spark.operators.merge import last_writer_wins, merge_into
from moonlink_spark.sources.fixtures import (
    CHANGES_SCHEMA,
    create_images_table,
    generate_changes_df,
    generate_images_df,
)
from moonlink_spark.streaming.ingest import start_cdc_stream

N = 1_000


def test_streaming_cdc_merge(spark, tmp_path):
    """Micro-batched CDC (file stream, several files per epoch) must land on
    the same final state as one global LWW merge. Each key is touched by
    exactly ONE event so the outcome is epoch-split-order independent —
    cross-epoch ordering is the SOURCE's contract (moonlink consumes an
    LSN-ordered replication stream; §3.2), not the merge kernel's."""
    table = create_images_table(spark, str(tmp_path / "tbl"), N, seed=42)

    from moonlink_spark.sources.fixtures import image_id_for, make_row

    rows = []
    for i in range(120):
        lsn = 10_000 + i
        if i % 3 == 0:  # update existing key i (full-row replace)
            r = make_row(42, i, version=1)
            rows.append({"op": "U", "lsn": lsn, **r})
        elif i % 3 == 1:  # insert brand-new key
            r = make_row(42, N + i, version=0)
            rows.append({"op": "I", "lsn": lsn, **r})
        else:  # delete existing key i
            rows.append({"op": "D", "lsn": lsn, "image_id": image_id_for(42, i),
                         "bytes": None, "w": None, "h": None, "fmt": None,
                         "caption": None, "phash": None})
    changes = spark.createDataFrame(rows, CHANGES_SCHEMA).repartition(12)

    src_dir = str(tmp_path / "cdc_src")
    changes.write.parquet(src_dir)
    stream = spark.readStream.schema(CHANGES_SCHEMA).option(
        "maxFilesPerTrigger", "4"
    ).parquet(src_dir)

    q = start_cdc_stream(
        table, stream, checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    base = generate_images_df(spark, N, seed=42).withColumn("op", F.lit("I")).withColumn(
        "lsn", F.lit(0).cast("long"))
    allr = base.unionByName(changes.select(*base.columns))
    oracle = last_writer_wins(allr, "image_id").filter(F.col("op") != "D")
    exp = sorted(tuple(r) for r in oracle.select("image_id", "caption").collect())
    got = sorted(tuple(r) for r in table.scan(columns=["image_id", "caption"]).collect())
    assert got == exp
    assert [s.operation for s in table.snapshots()].count("merge") >= 2


def test_alter_add_drop_column(spark, tmp_path):
    table = create_images_table(spark, str(tmp_path / "tbl"), 300, seed=42)

    alter_table(table, add_columns=[T.StructField("license", T.StringType(), True)])
    assert "license" in [f.name for f in table.schema.fields]
    # old files read the new column as null
    row = table.scan().select("license").first()
    assert row["license"] is None

    # new data carries the column through MERGE
    changes = generate_changes_df(spark, 300, 50, seed=42).withColumn(
        "license", F.lit("cc-by"))
    merge_into(table, changes, run_id="m-lic")
    vals = set(r["license"] for r in table.scan().select("license").distinct().collect())
    assert vals == {None, "cc-by"}

    # drop it again: metadata-only, scans no longer see it
    alter_table(table, drop_columns=["license"])
    assert "license" not in [f.name for f in table.schema.fields]
    assert "license" not in table.scan().columns

    with pytest.raises(ValueError):
        alter_table(table, drop_columns=["image_id"])  # key column protected
    with pytest.raises(ValueError):
        alter_table(table, add_columns=[T.StructField("w", T.IntegerType(), True)])


def test_psnr_invariant_post_maintenance(spark, tmp_path):
    """input_hint invariant: decoded pixels of surviving rows match the
    regenerated reference pixels — exact for png, PSNR >= 40dB for jpeg."""
    import numpy as np

    from moonlink_spark.functions.image import decode_image, gen_pixels, psnr
    from moonlink_spark.operators.compaction import CompactionConfig, compact

    table = create_images_table(spark, str(tmp_path / "tbl"), 400, seed=42)
    compact(table, CompactionConfig(mode="force_full"), run_id="c1")

    rows = table.scan().limit(64).collect()
    assert rows
    for r in rows:
        seq = int(r["image_id"].split("-")[2])
        ref = gen_pixels(42, seq, r["w"], r["h"], version=0)
        got = decode_image(bytes(r["bytes"]))
        if r["fmt"] == "png":
            assert np.array_equal(got, ref)
        else:
            assert psnr(ref, got) >= 40.0
