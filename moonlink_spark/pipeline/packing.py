"""Training-shard packing: assign documents to ~token-budget-sized shards.

The last step of a corpus pipeline: documents, in a deterministic global
order, are packed contiguously into shards of ≈*budget* tokens (shard k =
docs whose exclusive running token total lies in [k·B, (k+1)·B)). Contiguous
fill in a canonical order — not bin-packing — so the assignment is a pure
function of the corpus and reproducible anywhere.

Scale shape — a DISTRIBUTED GLOBAL PREFIX-SUM (the textbook two-phase
scan):
  1. range-partition + sort by doc id (one shuffle, the only one);
  2. per-partition token totals (tiny driver-side list, one number per
     partition) → exclusive partition offsets;
  3. per-partition cumulative sum + broadcast offset in one Arrow-batched
     pass — no global single-partition window, which is the naive
     formulation's scale-killer.

Token counts are whitespace tokens (matches text.token_stats.ws_tokens), so
the whole operator has an exact SQL twin (window cumsum) for the oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def pack_shards(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (doc_id, n_tokens, shard_id) with shard_id = floor(exclusive
    running token total / budget) over ascending *id_col* order."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("nt"),
    )
    num_partitions = num_partitions or toks.rdd.getNumPartitions() or 1
    part = (
        toks.repartitionByRange(num_partitions, "id")
        .sortWithinPartitions("id")
        .localCheckpoint(eager=True)  # pin partitioning across the two passes
    )

    def _sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        total = 0
        for pdf in batches:
            total += int(pdf["nt"].sum())
        yield pd.DataFrame({"pid": [pid], "total": [total]})

    sums = {
        int(r["pid"]): int(r["total"])
        for r in part.mapInPandas(_sums, "pid int, total long").collect()
    }
    offsets = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sums.get(pid, 0)
    budget = int(budget_tokens)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        cum = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:  # batches arrive in within-partition sort order
            nt = pdf["nt"].to_numpy()
            ends = cum + nt.cumsum()
            starts = ends - nt  # exclusive prefix
            cum = int(ends[-1]) if len(ends) else cum
            yield pd.DataFrame(
                {"id": pdf["id"], "nt": nt, "shard_id": starts // budget}
            )

    out = part.mapInPandas(_assign, "id long, nt long, shard_id long")
    return out.select(
        F.col("id").alias(id_col),
        F.col("nt").alias("n_tokens"),
        F.col("shard_id"),
    )
