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
