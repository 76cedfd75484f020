"""Warehouse: the multi-table façade — create/list/load/drop by name and
one policy-driven maintenance sweep across every table."""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.sources.fixtures import IMAGES_SCHEMA, generate_images_df
from moonlink_spark.streaming.ingest import MaintenancePolicy
from moonlink_spark.warehouse import Warehouse


def test_warehouse_lifecycle_and_maintain_all(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.list_tables() == []

    for name, n in (("alpha", 400), ("beta", 250)):
        t = wh.create_table(name, IMAGES_SCHEMA, key_columns=["image_id"])
        t.append(generate_images_df(spark, n, seed=42), run_id="a1")
    assert wh.list_tables() == ["alpha", "beta"]
    with pytest.raises(ValueError):
        wh.create_table("alpha", IMAGES_SCHEMA, key_columns=["image_id"])

    # aggressive policy: both tables are fully off-curve -> both cluster
    policy = MaintenancePolicy(max_unclustered_files=1, max_unclustered_bytes=1)
    report = wh.maintain_all(policy, expire_retain=1, sweep_grace_seconds=0,
                             run_id="sweep1")
    assert set(report) == {"alpha", "beta"}
    for name, n in (("alpha", 400), ("beta", 250)):
        t = wh.load_table(name)
        assert report[name]["clustered_snapshot"] is not None
        assert all(f.cluster_by == "zorder" for f in t.data_files())
        assert t.scan().count() == n

    # second sweep: no pressure anywhere -> every table is a no-op
    report2 = wh.maintain_all(policy, run_id="sweep2")
    assert all(r["clustered_snapshot"] is None for r in report2.values())

    wh.drop_table("beta")
    assert wh.list_tables() == ["alpha"]
    with pytest.raises(KeyError):
        wh.drop_table("beta")
    with pytest.raises(ValueError):
        wh.create_table("../evil", IMAGES_SCHEMA, key_columns=["image_id"])


def test_stage_metrics_rollup(spark, tmp_path):
    """Maintenance runs leave stage timings in lineage; the rollup
    aggregates them per op/stage with p50<=p95<=max and the warehouse sweep
    surfaces + persists it."""
    import os

    from moonlink_spark.observability import collect_stage_metrics, rollup_stage_metrics
    from moonlink_spark.operators.compaction import CompactionConfig, compact
    from moonlink_spark.operators.clustering import cluster
    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df

    t = create_images_table(spark, str(tmp_path / "t"), 400, seed=42)
    merge_into(t, generate_changes_df(spark, 400, 80, seed=42), run_id="m1")
    merge_into(t, generate_changes_df(spark, 400, 60, seed=42, lsn_start=9_000_000),
               run_id="m2")
    compact(t, CompactionConfig(mode="force_full", target_bytes=64 * 1024), run_id="c1")
    cluster(t, by=["phash", "w", "h"], run_id="z1", target_bytes=64 * 1024)

    runs = collect_stage_metrics(t)
    assert {r["op"] for r in runs} >= {"merge", "compact", "cluster"}
    roll = rollup_stage_metrics(t)
    assert roll["merge"]["probe_delete_sec"]["n"] == 2
    for op, stages in roll.items():
        for stage, s in stages.items():
            assert s["p50"] <= s["p95"] <= s["max"], (op, stage, s)
    assert os.path.exists(
        os.path.join(t.catalog.metadata_dir, "metrics", "rollup.json")
    )


def test_stage_drift_detection_on_synthetic_lineage(spark, tmp_path):
    """Round-4 VERDICT item 9: maintain_all flags a slowing stage. First
    sweep establishes the baseline rollup; lineage then gains runs whose
    merge stage is 3x slower; the next sweep's report lists that stage in
    stage_drift (and only that stage)."""
    import json
    import os

    from moonlink_spark.observability import detect_drift, load_rollup
    from moonlink_spark.sources.fixtures import create_images_table

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("t1", IMAGES_SCHEMA, key_columns=["image_id"])
    t.append(generate_images_df(spark, 200, seed=42), run_id="base")

    def _plant(run_id: str, plan_sec: float, commit_sec: float) -> None:
        rd = os.path.join(t.catalog.metadata_dir, "lineage", run_id)
        os.makedirs(rd, exist_ok=True)
        with open(os.path.join(rd, "metrics.json"), "w") as f:
            json.dump({"op": "merge", "stage_seconds":
                       {"plan": plan_sec, "commit": commit_sec}}, f)

    for i in range(4):  # baseline: fast runs
        _plant(f"fast-{i}", 0.4, 0.1)
    policy = MaintenancePolicy(max_unclustered_files=10**9)  # metrics only
    r1 = wh.maintain_all(policy=policy, run_id="sweep1")
    assert r1["t1"]["stage_drift"] == []  # no prior rollup → no drift
    assert load_rollup(t) is not None

    for i in range(4):  # the plan stage slows 3x; commit stays put
        _plant(f"slow-{i}", 1.2, 0.1)
    r2 = wh.maintain_all(policy=policy, run_id="sweep2")
    drift = r2["t1"]["stage_drift"]
    assert [(d["op"], d["stage"]) for d in drift] == [("merge", "plan")]
    assert drift[0]["ratio"] >= 1.5

    # detect_drift unit behavior: below-noise stages are ignored
    assert detect_drift(
        {"merge": {"plan": {"p95": 0.01}}},
        {"merge": {"plan": {"p95": 0.04}}},
    ) == []
