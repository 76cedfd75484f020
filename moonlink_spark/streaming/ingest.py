"""Structured Streaming CDC ingest: micro-batch MERGE apply.

Reference semantics being re-created (SURVEY.md §2 rows 3, 6; §3.2): a CDC
stream of (op ∈ {I,U,D}, lsn, <full row>) events, applied transactionally
per epoch — moonlink's per-transaction stream buffers committed at the
stream LSN boundary (transaction_stream.rs:58,137-143) map to Structured
Streaming micro-batches committed by foreachBatch; an aborted epoch simply
never reaches merge_into, so no partial state is ever visible (the abort =
drop-staged-buffer analog of table_handler.rs:908-917).

Exactly-once across restarts: Spark's checkpointed epoch id makes replays
carry the SAME batch_id; merge runs under run_id "stream-{batch_id}" so a
replayed epoch reuses the previous attempt's lineage (idempotent re-apply)
and LWW dedup within the batch keeps reordered events deterministic.

At scale this is the continuous-ingest path: the per-epoch work is exactly
one MERGE (broadcast probe + append), so throughput tracks merge_into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.table import MoonTable


def start_cdc_stream(
    table: MoonTable,
    changes_stream: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
    query_name: str = "moonlink_cdc",
) -> StreamingQuery:
    """Attach a streaming CDC source (op, lsn, <table columns>) to *table*.

    Returns the running StreamingQuery; each micro-batch commits one table
    snapshot (operation="merge") or none if the batch is empty."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(table, batch_df, run_id=f"stream-{batch_id}")

    writer = (
        changes_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_apply)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
