"""Read-at-LSN protocol + IVF ANN tests.

Read-at-LSN mirrors moonlink's visibility rule (read_state_manager.rs:59-164,
mooncake_table.rs:432-445): a scan at LSN X sees exactly the records
committed at ≤ X, and maintenance commits never change what an LSN reads.
"""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.operators import CompactionConfig, compact, merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df

N_BASE = 1_500
N_CHANGES = 300


def _ids(df):
    return sorted(r["image_id"] for r in df.select("image_id").collect())


def test_scan_at_lsn_watershed(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, N_BASE, seed=42)
    changes = generate_changes_df(spark, N_BASE, N_CHANGES, seed=42)
    changes.cache()
    cut = 1_000 + N_CHANGES  # lsn_start + n_changes (fixtures' second-lsn band)
    b1 = changes.filter(F.col("lsn") < cut)
    b2 = changes.filter(F.col("lsn") >= cut)
    merge_into(table, b1, run_id="m1")
    ids_after_m1 = _ids(table.scan())
    merge_into(table, b2, run_id="m2")
    changes.unpersist()

    # at the watershed: exactly merge #1's state
    assert _ids(table.scan_at_lsn(cut - 1)) == ids_after_m1
    # before any change lsn: the base table
    assert len(_ids(table.scan_at_lsn(0))) == N_BASE
    # at the max lsn: current state
    assert _ids(table.scan_at_lsn(10**12)) == _ids(table.scan())


def test_lsn_reads_survive_maintenance(spark, tmp_table_root):
    table = create_images_table(spark, tmp_table_root, N_BASE, seed=42)
    changes = generate_changes_df(spark, N_BASE, N_CHANGES, seed=42)
    merge_into(table, changes, run_id="m1")
    before = _ids(table.scan_at_lsn(10**12))
    compact(table, CompactionConfig(mode="force_full"), run_id="c1")
    # compact inherits the parent's flush lsn: same read, post-compaction files
    assert _ids(table.scan_at_lsn(10**12)) == before
    with pytest.raises(ValueError):
        # base append has flush-lsn 0, so lsn −1 sees nothing
        table.scan_at_lsn(-1)


def test_ivf_ann_recovers_planted_neighbor(spark):
    import numpy as np

    from moonlink_spark.pipeline.similarity import cosine_topk, ivf_ann_topk

    rng = np.random.Generator(np.random.PCG64(5))
    n, dims = 300, 64
    vecs = rng.normal(size=(n, dims)).astype("float32")
    vecs[100] = vecs[20] + rng.normal(scale=0.01, size=dims).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    ann = ivf_ann_topk(df, [20], k=5, n_centroids=16, nprobe=4)
    got = {r["neighbor_id"] for r in ann.collect()}
    assert 100 in got  # planted near-identical vector lands in the same list

    # IVF with nprobe = n_centroids degenerates to exact brute force
    full = ivf_ann_topk(df, [20], k=5, n_centroids=16, nprobe=16)
    exact = cosine_topk(df, [20], k=5)
    assert [tuple(r) for r in full.orderBy("rank").collect()] == [
        tuple(r) for r in exact.orderBy("rank").collect()
    ]
