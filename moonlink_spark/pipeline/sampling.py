"""Deterministic corpus sampling for training-data pipelines.

Hash-based Bernoulli sampling: membership depends only on (seed, id), never
on partitioning, cluster size, or row order — so a sample is reproducible
across runs and re-shards, can be extended (rate 0.1 ⊂ rate 0.2 for the
same seed), and needs no shuffle (pure map-side filter that Catalyst pushes
into the scan). The hash is the repo-wide md5-derived family
(functions/hashing.py), so DuckDB reproduces the exact row set.

`stratified_sample` applies a per-stratum rate (e.g. downsample boilerplate
languages, keep all rare ones) — the data-mixing knob of corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from moonlink_spark.functions.hashing import hex_int

_BUCKETS = 1_000_000


def sample_hash(seed: int, id_col: Column) -> Column:
    """Uniform bucket in [0, 1e6) from (seed, id) — the sampling coin."""
    return hex_int(
        F.concat_ws("|", F.lit(f"sample-{seed}"), id_col.cast("string"))
    ) % F.lit(_BUCKETS)


def deterministic_sample(
    df: DataFrame, rate: float, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff hash(seed, id) < rate·1e6. Nested samples: a higher
    rate with the same seed is a superset of a lower one."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(sample_hash(seed, F.col(id_col)) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: row kept iff
    hash(seed, id) < rate(stratum)·1e6; strata missing from *rates* use
    *default_rate* (0 drops them). One map-side filter, no shuffle."""
    thresh: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0,1], got {rate}")
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(sample_hash(seed, F.col(id_col)) < thresh)
