"""Initial-copy → CDC stream handoff (initial_copy.rs:1-219,
pg_replicate.rs:240-310): for ANY split point L0, copying the source
snapshot at L0 and applying the event stream strictly from L0 equals the
full replay — no gap, no duplicate."""

import os

from pyspark.sql import functions as F

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df
from moonlink_spark.streaming.bootstrap import initial_copy
from moonlink_spark.streaming.ingest import ingest_cdc_dir

N = 300


def _rows(t):
    return sorted(
        tuple(r) for r in t.scan(columns=["image_id", "caption", "phash"]).collect()
    )


def _handoff(spark, tmp_path, tag, events, l0):
    """Run the handoff at split point *l0* and return the resulting table.

    The source-at-L0 snapshot is materialized as a scratch MoonTable
    (base ⊕ events ≤ L0); the stream then re-delivers the FULL log with
    the pre-L0 duplicates staged as the LAST files, so they replay in an
    epoch AFTER newer state has applied — the adversarial order the
    boundary discard exists for (a stale update or delete re-applied late
    would corrupt newer rows)."""
    base = str(tmp_path)
    src = create_images_table(spark, os.path.join(base, f"src-{tag}"), N, seed=42)
    pre = events.filter(F.col("lsn") <= l0)
    post = events.filter(F.col("lsn") > l0)
    if pre.count():
        merge_into(src, pre, run_id="src-pre")

    t = initial_copy(
        spark, src.scan(), os.path.join(base, f"copy-{tag}"),
        key_columns=["image_id"], boundary_lsn=l0,
    )
    assert t.current_flush_lsn() == l0

    stage = os.path.join(base, f"stage-{tag}")
    post.coalesce(1).write.parquet(stage)
    pre.coalesce(1).write.parquet(stage, mode="append")  # duplicates land LAST
    ingest_cdc_dir(t, stage, os.path.join(base, f"ckpt-{tag}"),
                   max_files_per_trigger=1, since_lsn=l0)
    return t


def test_handoff_matches_full_replay_any_split(spark, tmp_table_root, tmp_path):
    twin = create_images_table(spark, tmp_table_root, N, seed=42)
    b0 = generate_changes_df(spark, N, 80, seed=42)
    b1 = generate_changes_df(spark, N, 60, seed=42, lsn_start=9_000_000)
    events = b0.unionByName(b1)
    merge_into(twin, events, run_id="full")
    expect = _rows(twin)
    lsns = sorted(r["lsn"] for r in events.select("lsn").collect())

    # split points: before everything (pure apply), mid-batch (discard +
    # apply), after everything (pure discard)
    for tag, l0 in [("lo", 0), ("mid", lsns[len(lsns) // 2]), ("hi", lsns[-1])]:
        t = _handoff(spark, tmp_path, tag, events, l0)
        assert _rows(t) == expect, f"split at {l0} ({tag}) diverged"
        assert t.current_flush_lsn() == max(lsns[-1], l0)


def test_handoff_without_filter_is_wrong(spark, tmp_table_root, tmp_path):
    """Negative control: the boundary discard is load-bearing. A
    deterministic delete-then-reinsert straddling the split — D(k)@100
    (pre-copy), I(k)@9M (post-copy) — replayed without since_lsn
    re-applies the stale delete in a later epoch and kills the reinserted
    row; with the filter (positive tests above) the full-replay oracle
    holds."""
    from moonlink_spark.sources.fixtures import image_id_for, make_row

    twin = create_images_table(spark, tmp_table_root, N, seed=42)
    k_row = make_row(42, 0, version=3)
    schema = twin.scan().schema
    events = spark.createDataFrame(
        [
            {"op": "D", "lsn": 100, "image_id": image_id_for(42, 0),
             **{f.name: None for f in schema.fields if f.name != "image_id"}},
            {"op": "I", "lsn": 9_000_000, **k_row},
        ],
        schema="op string, lsn long, " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        ),
    )
    merge_into(twin, events, run_id="full")
    l0 = 150

    base = str(tmp_path)
    src = create_images_table(spark, os.path.join(base, "src-neg"), N, seed=42)
    merge_into(src, events.filter(F.col("lsn") <= l0), run_id="src-pre")
    t = initial_copy(spark, src.scan(), os.path.join(base, "copy-neg"),
                     key_columns=["image_id"], boundary_lsn=l0)
    stage = os.path.join(base, "stage-neg")
    events.filter(F.col("lsn") > l0).coalesce(1).write.parquet(stage)
    events.filter(F.col("lsn") <= l0).coalesce(1).write.parquet(stage, mode="append")
    ingest_cdc_dir(t, stage, os.path.join(base, "ckpt-neg"),
                   max_files_per_trigger=1)  # NO since_lsn
    assert _rows(t) != _rows(twin)  # the reinserted row was wrongly re-deleted
