"""End-to-end smoke: create images table -> merge CDC -> compact -> cluster
-> expire -> scan equals the plain-DataFrame oracle (FIXTURES.md F5)."""

import numpy as np

from pyspark.sql import functions as F

from moonlink_spark.functions.image import decode_image, gen_pixels, psnr
from moonlink_spark.operators import (
    CompactionConfig,
    cluster,
    compact,
    expire_snapshots,
    merge_into,
    sweep_orphans,
)
from moonlink_spark.operators.merge import last_writer_wins
from moonlink_spark.sources.fixtures import (
    create_images_table,
    generate_changes_df,
    generate_images_df,
)

N_BASE = 2_000
N_CHANGES = 400


def oracle_rows(spark, n_base, n_changes, seed=42):
    """Plain-DataFrame oracle: base upserted by LWW changes (no engine code)."""
    base = generate_images_df(spark, n_base, seed=seed).withColumn(
        "op", F.lit("I")
    ).withColumn("lsn", F.lit(0).cast("long"))
    changes = generate_changes_df(spark, n_base, n_changes, seed=seed)
    allr = base.unionByName(changes.select(*base.columns))
    final = last_writer_wins(allr, "image_id").filter(F.col("op") != "D")
    return final.drop("op", "lsn")


def as_sorted_rows(df):
    cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    return [tuple(r) for r in df.select(cols).orderBy("image_id").collect()]


def test_e2e_merge_compact_cluster_expire(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, N_BASE, seed=42)
    files0 = table.data_files()
    assert len(files0) > 4  # 80% small-file layout produced many files
    assert sum(f.record_count for f in files0) == N_BASE

    changes = generate_changes_df(spark, N_BASE, N_CHANGES, seed=42)
    res = merge_into(table, changes, run_id="m1")
    assert res.inserted_rows > 0

    pre_maintenance = as_sorted_rows(table.scan())
    expected = as_sorted_rows(oracle_rows(spark, N_BASE, N_CHANGES))
    assert pre_maintenance == expected

    snap_before = table.current_snapshot_id()

    # compaction (force: the fixture files are all tiny)
    sid = compact(table, CompactionConfig(mode="force_regular", min_files=2), run_id="c1")
    assert sid is not None
    assert as_sorted_rows(table.scan()) == expected
    # snapshot isolation: the pre-compaction snapshot still reads identically
    assert as_sorted_rows(table.scan(snapshot_id=snap_before)) == expected
    # no delete files should survive when all files carrying DVs were compacted
    assert len(table.data_files()) < len(files0)

    # clustering
    sid2 = cluster(table, by=["phash", "w", "h"], curve="zorder", run_id="z1")
    assert sid2 is not None
    assert as_sorted_rows(table.scan()) == expected
    assert all(f.cluster_by == "zorder" for f in table.data_files())

    # pixel + caption invariants on a sample of surviving rows
    sample = table.scan().filter(F.col("fmt") == "jpeg").limit(5).collect()
    for r in sample:
        pixels = decode_image(bytes(r["bytes"]))
        assert pixels.shape == (r["h"], r["w"], 3)

    # expiry + orphan sweep: old snapshots gone, current scan unchanged
    expired = expire_snapshots(table, retain_last=1)
    assert snap_before in expired
    removed = sweep_orphans(table, quarantine=False, older_than_seconds=0)
    assert removed  # compacted-away victims were reclaimed
    assert as_sorted_rows(table.scan()) == expected


def test_pixels_roundtrip_psnr():
    px = gen_pixels(42, 7, 33, 21)
    from moonlink_spark.functions.image import encode_image

    assert np.array_equal(decode_image(encode_image(px, "png")), px)
    lossy = decode_image(encode_image(px, "jpeg"))
    assert psnr(px, lossy) >= 40.0


def test_sql_view_surface(spark, tmp_table_root):
    """create_or_replace_view: plain Spark SQL over the snapshot-isolated
    scan, including time travel to a pre-merge snapshot."""
    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df

    t = create_images_table(spark, tmp_table_root, 400, seed=42)
    pre = t.current_snapshot_id()
    merge_into(t, generate_changes_df(spark, 400, 80, seed=5), run_id="m1")

    t.create_or_replace_view("imgs")
    t.create_or_replace_view("imgs_pre", snapshot_id=pre)
    cur = spark.sql("SELECT count(*) AS n FROM imgs").first()["n"]
    old = spark.sql("SELECT count(*) AS n FROM imgs_pre").first()["n"]
    assert old == 400
    assert cur == t.scan().count()
    # predicate + projection flow through SQL
    w = spark.sql("SELECT max(w) AS mw FROM imgs WHERE fmt = 'png'").first()["mw"]
    assert w is not None
