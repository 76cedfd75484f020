"""Sessionization + custom stateful streaming operator tests."""

import pandas as pd

from pyspark.sql import functions as F

from moonlink_spark.streaming.sessions import sessionize, stateful_user_counts


def _events(spark):
    rows = [
        # user 1: two sessions separated by a 2h gap
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 02:30:00", 1),
        # user 2: one session, events exactly 30min apart (gap NOT exceeded:
        # strict > semantics)
        (3, "2024-01-01 00:00:00", 2),
        (4, "2024-01-01 00:30:00", 2),
        # user 3: single event
        (5, "2024-01-01 05:00:00", 3),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_sessionize_gap_semantics(spark):
    out = sessionize(_events(spark), gap_minutes=30)
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in out.collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 2, (3, 1): 1}


def test_stateful_counts_cross_batch(spark, tmp_path):
    """applyInPandasWithState must carry per-user state across micro-batches:
    the same users appear in both source files (one file per trigger)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = _events(spark)
    # users 1 and 2 both span the two files, so their counters must survive
    # the micro-batch boundary
    ev.filter(F.col("event_id").isin(0, 3)).coalesce(1).write.parquet(src)
    ev.filter(~F.col("event_id").isin(0, 3)).coalesce(1).write.mode("append").parquet(src)

    got = {
        r["user_id"]: r["n_events"]
        for r in stateful_user_counts(spark, src, ckpt, max_files_per_trigger=1).collect()
    }
    want = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_sessionize_stream_crosses_batches(spark, tmp_path):
    """A session SPANNING a micro-batch boundary must merge via the state
    store: file 1 ends mid-session, file 2 continues it within the gap, and
    the final output equals the batch sessionize of the union."""
    from moonlink_spark.streaming.sessions import sessionize_stream

    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    f1 = [
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 00:05:00", 2),
    ]
    f2 = [
        (3, "2024-01-01 00:25:00", 1),  # continues user 1's open session
        (4, "2024-01-01 03:00:00", 1),  # new session (gap > 30min)
        (5, "2024-01-01 02:00:00", 2),  # new session for user 2
    ]
    for i, rows in enumerate([f1, f2]):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(tmp_path / f"t{i}"))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / f"t{i}" / "*.parquet"))[0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000_000 + i * 10,) * 2)

    out = sessionize_stream(spark, src, str(tmp_path / "ckpt"), gap_minutes=30)
    got = {
        (r["user_id"], r["session_seq"]): (str(r["session_start"]), r["n_events"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("2024-01-01 00:00:00", 3),  # crossed the batch boundary
        (1, 2): ("2024-01-01 03:00:00", 1),
        (2, 1): ("2024-01-01 00:05:00", 1),
        (2, 2): ("2024-01-01 02:00:00", 1),
    }
