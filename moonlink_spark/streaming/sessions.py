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


def sessionize_stream(
    spark,
    events_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """STREAMING gap-based sessionization via applyInPandasWithState — the
    stateful twin of ``sessionize``, producing the identical session rows
    (same oracle) when the source files arrive in event-time order per key
    (the staging contract: each file covers a disjoint, increasing ts
    range — what a log shipper delivers).

    Per-user state = (last_ts_us, session_seq, open_start_us, open_count).
    Each micro-batch folds its (ts, event_id)-sorted rows vectorized in
    pandas: gap flags -> cumsum -> per-session groupby. COMPLETED sessions
    are final on first emission; the still-OPEN session is re-emitted each
    batch with its running aggregate, so in update mode the last emission
    per (user_id, session_seq) is the final state — the reader keeps the
    max-n_events row per key, and no end-of-stream flush is needed."""
    import uuid

    import numpy as np

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    ).parquet(events_dir)
    gap_us = gap_minutes * 60 * 1_000_000

    def _sess(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts, seq, open_start, open_n = state.get
        else:
            last_ts, seq, open_start, open_n = -1, 0, -1, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "event_id"], kind="stable")
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        prev = np.concatenate(([last_ts], ts_us[:-1]))
        new_flag = (prev < 0) | ((ts_us - prev) > gap_us)
        seqs = seq + np.cumsum(new_flag)
        # aggregate per session id
        out_seq, out_start, out_end, out_n = [], [], [], []
        for s in np.unique(seqs):
            m = seqs == s
            t = ts_us[m]
            start, end, n = int(t[0]), int(t[-1]), int(m.sum())
            if s == seq and open_n > 0:  # batch continues the carried session
                start, n = open_start, n + open_n
            out_seq.append(int(s)); out_start.append(start)
            out_end.append(end); out_n.append(n)
        state.update((int(ts_us[-1]), int(seqs[-1]), int(out_start[-1]), int(out_n[-1])))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(out_seq), key[0], dtype=np.int64),
                "session_seq": np.array(out_seq, dtype=np.int64),
                "session_start": pd.to_datetime(np.array(out_start, dtype="int64"), unit="us"),
                "session_end": pd.to_datetime(np.array(out_end, dtype="int64"), unit="us"),
                "n_events": np.array(out_n, dtype=np.int64),
            }
        )

    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sess,
        outputStructType=(
            "user_id long, session_seq long, session_start timestamp, "
            "session_end timestamp, n_events long"
        ),
        stateStructType="last_ts long, seq long, open_start long, open_n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"moonlink_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.queryName(name)
        .outputMode("update")
        .format("memory")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table(name)
    w = Window.partitionBy("user_id", "session_seq").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "session_seq", "session_start", "session_end", "n_events")
    )


def stage_time_ordered_files(
    spark, src_parquet: str, out_dir: str, n_files: int = 3, ts_col: str = "ts"
) -> None:
    """Split an events parquet into *n_files* files covering increasing
    event-time ranges, with strictly increasing mtimes — the arrival order a
    log shipper produces, and the contract sessionize_stream relies on for
    per-key event-time order across micro-batches."""
    import glob
    import os
    import shutil
    import tempfile

    ev = spark.read.parquet(src_parquet).withColumn(
        "_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    qs = ev.approxQuantile("_us", [i / n_files for i in range(1, n_files)], 0.0)
    bounds = [None, *[int(q) for q in qs], None]
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("_us") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("_us") < bounds[i + 1])
        part = part.drop("_us")
        tmp = tempfile.mkdtemp(prefix="sess_stage_")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        dst = os.path.join(out_dir, f"{i:04d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))
        shutil.rmtree(tmp, ignore_errors=True)


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
