"""Scale-safe cluster bin assignment: the native array-literal boundary
filter (small bin counts) and the searchsorted pandas-UDF path (large bin
counts) must agree bit-for-bit, and the large path must plan/execute in
bounded time at 4096+ bins (at 100 TB a re-cluster has ~200k boundaries —
an O(bins)-per-row codegen expression is the failure mode being pinned)."""

import time

import numpy as np

from pyspark.sql import functions as F

import moonlink_spark.operators.clustering as cl
from moonlink_spark.operators.clustering import ClusterPlan, assign_keys_and_bins


def _plan_for(n_bins: int, salts: list[int] | None = None) -> ClusterPlan:
    rng = np.random.Generator(np.random.PCG64(7))
    boundaries = sorted(int(x) for x in rng.integers(0, 1 << 47, size=n_bins - 1))
    salts = salts or [1] * n_bins
    offsets = [0]
    for s in salts:
        offsets.append(offsets[-1] + s)
    return ClusterPlan(
        run_id="t", curve="zorder", by=["x", "y", "z"],
        bounds=[(0.0, 65535.0)] * 3, boundaries=boundaries,
        salts=salts, offsets=offsets,
    )


def _df(spark, n=20_000):
    return spark.range(n).select(
        F.format_string("id-%06d", F.col("id")).alias("image_id"),
        (F.col("id") % 65536).cast("long").alias("x"),
        ((F.col("id") * 131) % 65536).cast("long").alias("y"),
        ((F.col("id") * 31 + 7) % 65536).cast("long").alias("z"),
    )


def test_native_and_searchsorted_paths_agree(spark, monkeypatch):
    """Same plan (with SALTED bins), both execution strategies: identical
    (zkey, bin) per row."""
    salts = [1] * 64
    salts[10] = 3
    salts[40] = 2
    plan = _plan_for(64, salts=salts)
    df = _df(spark, 10_000)

    native = {
        r["image_id"]: (r["_zkey"], r["_bin"])
        for r in assign_keys_and_bins(df, plan, key_col="image_id").collect()
    }
    monkeypatch.setattr(cl, "_NATIVE_BOUNDARY_MAX", 0)
    udf = {
        r["image_id"]: (r["_zkey"], r["_bin"])
        for r in assign_keys_and_bins(df, plan, key_col="image_id").collect()
    }
    assert native == udf


def test_many_bins_bounded_time(spark):
    """4096 base bins: assignment must execute via the O(log bins) path in
    bounded time with a compact plan (no 4095-literal codegen array)."""
    plan = _plan_for(4096)
    df = _df(spark, 50_000)
    t0 = time.time()
    out = assign_keys_and_bins(df, plan, key_col="image_id")
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("_bin").alias("lo"),
        F.max("_bin").alias("hi"),
        F.countDistinct("_bin").alias("nb"),
    ).first()
    elapsed = time.time() - t0
    assert agg["n"] == 50_000
    assert 0 <= agg["lo"] and agg["hi"] < 4096
    assert agg["nb"] > 1000  # keys actually spread across bins
    assert elapsed < 60, f"bin assignment took {elapsed:.1f}s"
    # monotone: bin is nondecreasing in zkey
    rows = out.select("_zkey", "_bin").orderBy("_zkey").collect()
    bins = [r["_bin"] for r in rows]
    assert bins == sorted(bins)
