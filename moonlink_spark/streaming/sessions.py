"""Sessionization: gap-based event sessions (batch) + a custom stateful
streaming operator (applyInPandasWithState).

Batch form is pure window functions — one shuffle on user_id, whole-stage
codegen, exact SQL twin for the oracle. The streaming form demonstrates the
engine's custom-stateful-operator path: per-key state carried across
micro-batches by Spark's state store, Arrow-batched pandas on both sides
(no per-row Python against the state store API).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions: a new session starts when a user's inter-event
    gap exceeds *gap_minutes*. Returns one row per session:
    (user_id, session_seq, session_start, session_end, n_events).

    One shuffle (partitionBy user); the running session counter is a
    prefix-sum window — no UDF, no state store needed in batch."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_us = gap_minutes * 60 * 1_000_000  # exact integer µs: oracle-safe at
    prev = F.lag(F.col(ts_col)).over(w)    # sub-second event resolution
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_session = F.when(
        prev.isNull() | ((us(F.col(ts_col)) - us(prev)) > gap_us),
        1,
    ).otherwise(0)
    sess = (
        events.withColumn("_new", new_session)
        .withColumn("session_seq", F.sum("_new").over(w).cast("long"))
    )
    return (
        sess.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(user_col, "session_seq", "session_start", "session_end", "n_events")
    )


def stateful_user_counts(
    spark,
    events_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-user running event counter whose state survives across micro-batches
    (the applyInPandasWithState archetype — sessionization, dedup windows,
    CDC reconciliation all share this skeleton).

    Drains the bounded source with Trigger.AvailableNow, forcing multiple
    micro-batches (maxFilesPerTrigger) so cross-batch state continuity is
    actually exercised; returns the final per-user totals."""
    import uuid

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    ).parquet(events_dir)

    def _count(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    counted = stream.groupBy("user_id").applyInPandasWithState(
        _count,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"moonlink_state_counts_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.queryName(name)
        .outputMode("update")
        .format("memory")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, batch); the LAST emission per user
    # is the running total after all batches
    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events")
    )
