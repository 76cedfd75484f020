"""Resume / idempotency: a maintenance run killed mid-flight must resume at
partition (bin) granularity and produce the identical committed state
(north rule: "checkpoints per-partition lineage ... resumes idempotently";
reference analog: WAL recovery, wal.rs:1117-1334)."""

import json
import os

from moonlink_spark.operators.compaction import CompactionConfig, compact, plan_compaction
from moonlink_spark.operators.clustering import cluster
from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df

N = 1_500


def _rows(table):
    return sorted(
        tuple(r) for r in table.scan(columns=["image_id", "caption", "phash"]).collect()
    )


def test_compaction_resume_skips_done_bins(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, N, seed=42)
    expected = _rows(table)
    cfg = CompactionConfig(mode="force_full", target_bytes=64 * 1024)

    # phase 1: plan only (simulates a run killed right after planning)
    plan = plan_compaction(table, cfg, run_id="r1")
    assert plan is not None and len(plan.groups) >= 2
    lineage_dir = os.path.join(table.catalog.metadata_dir, "lineage", "r1")
    assert os.path.exists(os.path.join(lineage_dir, "plan.json"))

    # phase 2: full run under the SAME run_id -> must reuse the plan
    sid = compact(table, cfg, run_id="r1")
    assert sid is not None
    plan2 = plan_compaction(table, cfg, run_id="r1")
    assert plan2.groups == plan.groups  # deterministic, reloaded not recomputed
    assert _rows(table) == expected

    # every group has at least one lineage record (oversized groups split
    # into multiple sub-bins, each with its own record)
    recs = [n for n in os.listdir(lineage_dir) if n.startswith("bin-")]
    assert len(recs) >= len(plan.groups)

    # phase 3: re-running the SAME completed run is a no-op on data files:
    # all bins are skipped via lineage, output paths identical
    files_before = sorted(f.file_path for f in table.data_files())
    sid2 = compact(table, cfg, run_id="r1")
    # the second run commits a snapshot but reuses every written file
    assert sid2 is not None
    files_after = sorted(f.file_path for f in table.data_files())
    assert files_before == files_after
    assert _rows(table) == expected


def test_cluster_resume_deterministic(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, N, seed=42)
    merge_into(table, generate_changes_df(spark, N, 200, seed=42), run_id="m1")
    expected = _rows(table)

    sid = cluster(table, by=["phash", "w", "h"], curve="zorder",
                  run_id="z1", target_bytes=64 * 1024)
    assert sid is not None
    assert _rows(table) == expected

    lineage_dir = os.path.join(table.catalog.metadata_dir, "lineage", "z1")
    with open(os.path.join(lineage_dir, "plan.json")) as f:
        plan = json.load(f)
    # salted bins exist for the hot phash prefixes (FIXTURES.md skew)
    assert len(plan["salts"]) >= 1
    # per-bin lineage: files-out + row counts recorded
    recs = [n for n in os.listdir(lineage_dir) if n.startswith("bin-")]
    assert recs
    total = 0
    for n in recs:
        with open(os.path.join(lineage_dir, n)) as f:
            total += json.load(f)["record_count"]
    assert total == len(expected)


def test_merge_lww_adversarial(spark, tmp_table_root):
    """Same-key double update, delete-then-reinsert, delete-of-missing-key —
    engine result must equal the plain-DataFrame LWW oracle."""
    from pyspark.sql import functions as F

    from moonlink_spark.operators.merge import last_writer_wins
    from moonlink_spark.sources.fixtures import generate_images_df

    table = create_images_table(spark, tmp_table_root, N, seed=42)
    changes = generate_changes_df(spark, N, 300, seed=42)
    merge_into(table, changes, run_id="m1")

    base = generate_images_df(spark, N, seed=42).withColumn("op", F.lit("I")).withColumn(
        "lsn", F.lit(0).cast("long"))
    allr = base.unionByName(changes.select(*base.columns))
    oracle = last_writer_wins(allr, "image_id").filter(F.col("op") != "D")
    exp = sorted(tuple(r) for r in oracle.select("image_id", "caption", "phash").collect())
    assert _rows(table) == exp


def test_compaction_splits_oversized_file(spark, tmp_table_root):
    """A single victim far above target (e.g. a huge foreign parquet from
    add_files) must SPLIT into ~target-size pieces written in parallel —
    not one serial-tail task — with rows preserved and a deterministic,
    resumable layout."""
    import pyspark.sql.functions as F

    from moonlink_spark.sources.fixtures import generate_images_df

    table = create_images_table(spark, tmp_table_root, 200, seed=42)
    big = generate_images_df(spark, 3000, seed=9).withColumn(
        "image_id", F.concat(F.lit("big-"), F.col("image_id"))
    ).withColumn("_bin", F.lit(0))
    table.append(big, explicit_bins=big, num_bins=1, run_id="bigf")
    huge = max(table.data_files(), key=lambda f: f.file_size_bytes)
    expected = _rows(table)

    cfg = CompactionConfig(
        mode="force_full", target_bytes=max(16 * 1024, huge.file_size_bytes // 4)
    )
    sid = compact(table, cfg, run_id="sp1")
    assert sid is not None
    assert _rows(table) == expected
    # the oversized victim became multiple ~target outputs
    assert len(table.data_files()) >= 3
    assert all(f.file_path != huge.file_path for f in table.data_files())
    # resume of the completed run reuses every written piece
    files_before = sorted(f.file_path for f in table.data_files())
    compact(table, cfg, run_id="sp1")
    assert sorted(f.file_path for f in table.data_files()) == files_before


def test_merge_writes_partition_lineage(spark, tmp_table_root):
    """Merge checkpoints per-bin lineage for its INSERT writes (bin contents
    are a pure function of the change batch, so resume is safe); the DELETE
    write intentionally has NO lineage — its positions depend on table
    state a concurrent append can change between attempts, so it re-writes
    fully on retry. The skip-on-lineage mechanism itself is exercised by the
    compact/cluster resume tests, which share the same writer."""
    table = create_images_table(spark, tmp_table_root, N, seed=42)
    merge_into(table, generate_changes_df(spark, N, 200, seed=42), run_id="ml1")
    root = os.path.join(table.catalog.metadata_dir, "lineage", "ml1")
    ins = [n for n in os.listdir(os.path.join(root, "inserts")) if n.startswith("bin-")]
    assert ins
    assert not os.path.isdir(os.path.join(root, "deletes"))
    # records round-trip the file entries (path + stats) used on resume
    with open(os.path.join(root, "inserts", ins[0])) as f:
        rec = json.load(f)
    assert os.path.exists(rec["file_path"]) and rec["record_count"] > 0
