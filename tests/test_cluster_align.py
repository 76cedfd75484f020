"""curve="align" — categorical clustering by distinct value tuples.

The align rewrite is the produce-the-precondition op for
export_iceberg(partition_by=...): after it, every data file holds exactly
one value per align column (per-file min==max in catalog stats), so the
stats-driven identity-partition export is zero-rewrite. The bin map is
attached via ONE broadcast join (no array literals, no Python worker), and
a hot value splits into several same-value files via the salt machinery.
"""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.operators import merge_into
from moonlink_spark.operators.clustering import cluster
from moonlink_spark.operators.optimize import optimize
from moonlink_spark.sources.fixtures import (
    IMAGES_SCHEMA,
    create_images_table,
    generate_changes_df,
    generate_images_df,
)
from moonlink_spark.table import MoonTable


def _assert_aligned(table, cols):
    for f in table.data_files():
        for c in cols:
            st = f.stats[c]
            assert st["min"] == st["max"], (f.file_path, c, st)


def test_align_full_applies_dvs_and_aligns(spark, tmp_table_root):
    """Full align over a mixed-fmt table with deletion vectors: one
    snapshot, DVs applied inline, every file single-fmt, rows preserved."""
    t = create_images_table(spark, tmp_table_root, 1500, seed=42)
    merge_into(t, generate_changes_df(spark, 1500, 300, seed=42), run_id="m1")
    expect = {r["image_id"] for r in t.scan(columns=["image_id"]).collect()}

    sid = optimize(t, mode="full", cluster_by=["fmt"], curve="align", run_id="al1")
    assert sid is not None
    assert not t.delete_files()  # full rewrite leaves the table DV-free
    _assert_aligned(t, ["fmt"])
    got = {r["image_id"] for r in t.scan(columns=["image_id"]).collect()}
    assert got == expect


def test_align_salts_split_hot_value(spark, tmp_table_root):
    """A skewed value (every row one fmt) must split into multiple files of
    that one value when its bytes exceed target_bytes — never one giant
    file, never mixed values."""
    t = MoonTable.create(spark, tmp_table_root, IMAGES_SCHEMA, key_columns=["image_id"])
    df = generate_images_df(spark, 1200, seed=42).withColumn("fmt", F.lit("png"))
    t.append(df, run_id="a1")
    total = sum(f.file_size_bytes for f in t.data_files())

    cluster(t, by=["fmt"], curve="align", run_id="al1", target_bytes=total // 4)
    files = t.data_files()
    assert len(files) >= 3  # salted split, not one file
    _assert_aligned(t, ["fmt"])
    assert t.scan().count() == 1200


def test_align_incremental_keeps_aligned_files(spark, tmp_table_root):
    """Incremental scope rewrites only files not yet aligned: the prior
    align output survives byte-identical, fresh mixed appends get aligned."""
    t = create_images_table(spark, tmp_table_root, 1000, seed=42)
    optimize(t, mode="full", cluster_by=["fmt"], curve="align", run_id="al1")
    aligned = {f.file_path for f in t.data_files()}

    t.append(generate_images_df(spark, 300, seed=7), run_id="a2")
    sid = optimize(
        t, mode="incremental", cluster_by=["fmt"], curve="align", run_id="al2"
    )
    assert sid is not None
    post = {f.file_path for f in t.data_files()}
    assert aligned <= post  # previously-aligned files untouched
    _assert_aligned(t, ["fmt"])
    assert t.scan().count() == 1300
    # steady state: nothing left to do
    assert (
        optimize(t, mode="incremental", cluster_by=["fmt"], curve="align",
                 run_id="al3")
        is None
    )


def test_align_then_partitioned_export(spark, tmp_path):
    """The advertised remediation path: mixed table -> align -> zero-rewrite
    identity-partitioned export -> pruned external scan."""
    from moonlink_spark.iceberg import export_iceberg, read_iceberg_scan

    t = create_images_table(spark, str(tmp_path / "tbl"), 800, seed=42)
    dest = str(tmp_path / "ice")
    with pytest.raises(ValueError, match="curve='align'"):
        export_iceberg(t, dest, partition_by=["fmt"])  # hint names the fix

    optimize(t, mode="full", cluster_by=["fmt"], curve="align", run_id="al1")
    export_iceberg(t, dest, partition_by=["fmt"])
    full = read_iceberg_scan(spark, dest)
    png = read_iceberg_scan(spark, dest, partition_filter={"fmt": "png"})
    n_png = t.scan(columns=["fmt"]).filter("fmt = 'png'").count()
    assert full.count() == t.scan().count() == 800
    assert png.count() == n_png
    assert 0 < len(png.inputFiles()) < len(full.inputFiles())


def test_align_rejects_nulls_and_high_cardinality(spark, tmp_table_root, monkeypatch):
    t = MoonTable.create(spark, tmp_table_root, IMAGES_SCHEMA, key_columns=["image_id"])
    df = generate_images_df(spark, 200, seed=42)
    t.append(
        df.withColumn(
            "fmt", F.when(F.col("w") % 7 == 0, F.lit(None)).otherwise(F.col("fmt"))
        ),
        run_id="a1",
    )
    with pytest.raises(ValueError, match="NULL partition value"):
        cluster(t, by=["fmt"], curve="align", run_id="al1")

    import moonlink_spark.operators.clustering as cl

    monkeypatch.setattr(cl, "_ALIGN_MAX_VALUES", 1)
    t2 = MoonTable.create(
        spark, tmp_table_root + "2", IMAGES_SCHEMA, key_columns=["image_id"]
    )
    t2.append(df, run_id="a1")
    with pytest.raises(ValueError, match="distinct value tuples"):
        cluster(t2, by=["fmt"], curve="align", run_id="al2")


def test_align_plan_is_broadcast_join_no_python(spark, tmp_table_root):
    """Scale shape: the bin assignment is a broadcast hash join — no
    Python/Arrow eval node, no giant IN/array literals in the plan."""
    from moonlink_spark.operators.clustering import _plan, assign_keys_and_bins

    t = create_images_table(spark, tmp_table_root, 600, seed=42)
    plan = _plan(t, "alp", ["fmt"], "align", 1 << 30, 16)
    df = assign_keys_and_bins(t.scan(), plan, key_col="image_id")
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in txt
    for bad in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert bad not in txt


def _events_table(spark, root, n=800):
    """MoonTable with timestamps spanning 4 days, files mixing days."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("val", T.DoubleType()),
    ])
    base = 1704067200  # 2024-01-01T00:00:00Z
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") % 4) * 86400 + (F.col("id") % 24) * 3600
        ).alias("ts"),
        (F.col("id") * 1.5).alias("val"),
    )
    t = MoonTable.create(spark, root, schema, key_columns=["event_id"])
    t.append(df, run_id="a1")
    return t


def test_align_day_then_temporal_export(spark, tmp_path):
    """The event-table chain: files span days -> export refuses -> align by
    the day(ts) TRANSFORM (derived key, same broadcast-join kernel) ->
    stats-driven day-partitioned export (transform(min)==transform(max)
    gate) -> external reader prunes one day from manifest metadata."""
    import datetime as _dt

    from moonlink_spark.iceberg import export_iceberg, read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata

    t = _events_table(spark, str(tmp_path / "tbl"))
    dest = str(tmp_path / "ice")
    with pytest.raises(ValueError, match="cluster the table"):
        export_iceberg(t, dest, partition_by=["day(ts)"])

    cluster(t, by=["day(ts)"], curve="align", run_id="al1")
    assert t.scan().count() == 800
    export_iceberg(t, dest, partition_by=["day(ts)"])
    meta = load_iceberg_metadata(dest)
    f0 = meta["partition-specs"][0]["fields"][0]
    assert f0["transform"] == "day" and f0["name"] == "ts_day"

    full = read_iceberg_scan(spark, dest)
    assert full.count() == 800
    jan3 = read_iceberg_scan(
        spark, dest, partition_filter={"ts": _dt.datetime(2024, 1, 3, 15, 0)}
    )
    assert 0 < len(jan3.inputFiles()) < len(full.inputFiles())
    got = {r["event_id"] for r in jan3.select("event_id").collect()}
    assert got == {i for i in range(800) if i % 4 == 2}  # day 3 = id%4==2

    # bucket export is rejected up front (stats cannot witness buckets)
    with pytest.raises(ValueError, match="bucket export is not stats-derivable"):
        export_iceberg(t, str(tmp_path / "ice2"),
                       partition_by=["bucket[4](event_id)"])


def test_align_bucket_expression(spark, tmp_path):
    """align by bucket[N](col): the derived key comes from the vectorized
    Appendix-B Murmur3 fallback; every output file holds exactly one
    bucket of event_id (checked against the scalar reference hash)."""
    from moonlink_spark.iceberg.transforms import apply_transform

    t = _events_table(spark, str(tmp_path / "tbl"), n=600)
    cluster(t, by=["bucket[4](event_id)"], curve="align", run_id="al1")
    assert t.scan().count() == 600
    for f in t.data_files():
        ids = [
            r["event_id"]
            for r in spark.read.parquet(f.file_path).select("event_id").collect()
        ]
        buckets = {apply_transform("bucket[4]", i, "long") for i in ids}
        assert len(buckets) == 1, (f.file_path, buckets)


def test_export_identity_date_and_truncate(spark, tmp_path):
    """Identity export on temporal sources stores spec-integer values
    (micros), and truncate[W] exports gate on transform(min)==transform(max)
    — a table aligned by truncate[2](name) exports even though raw
    min!=max inside a file."""
    import pyspark.sql.types as T

    from moonlink_spark.iceberg import export_iceberg, read_iceberg_scan
    from moonlink_spark.iceberg.reader import load_iceberg_metadata

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    t = MoonTable.create(spark, str(tmp_path / "tbl"), schema, key_columns=["k"])
    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("aa")).otherwise(F.lit("bb")),
            F.col("id").cast("string"),
        ).alias("name"),
    )
    t.append(df, run_id="a1")
    with pytest.raises(ValueError, match="cluster the table"):
        export_iceberg(t, str(tmp_path / "ice0"), partition_by=["truncate[2](name)"])
    cluster(t, by=["truncate[2](name)"], curve="align", run_id="al1")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest, partition_by=["truncate[2](name)"])
    meta = load_iceberg_metadata(dest)
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "truncate[2]"
    full = read_iceberg_scan(spark, dest)
    aa = read_iceberg_scan(spark, dest, partition_filter={"name": "aa999"})
    assert full.count() == 300
    assert 0 < len(aa.inputFiles()) < len(full.inputFiles())
    assert {r["name"][:2] for r in aa.select("name").collect()} == {"aa"}
