"""Shared pipeline helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for expensive map stages.

    A small corpus often arrives as one unsplittable parquet row group, so
    every downstream map expression (shingle explode, hash folds, vector
    dots) runs on a single core while the rest of the cluster idles — the
    "input skew" case of the optimization playbook. When the input has fewer
    partitions than the cluster's default parallelism, round-robin
    repartition it up front (the shuffled bytes are by definition small —
    few partitions == small input); at scale the scan already yields more
    splits than cores and this is a no-op, so no extra shuffle is added to
    a 100 TB job.
    """
    if df.isStreaming:
        # a streaming frame has no .rdd and its micro-batch partitioning
        # is the source's concern — pass through untouched
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: planning-only failure
        return df
    if n >= target:
        return df
    return df.repartition(target)
