"""Multi-table façade — the moonlink_backend analog.

The reference's backend crate owns N tables keyed by id and routes
create/drop/optimize to them (moonlink_backend/src/lib.rs:357-372 exposes
optimize_table(table_id, mode); the REST surface mirrors it,
rest_api.rs:760-771). Here a Warehouse is a directory of MoonTables —
one subdirectory per table, each fully self-describing — plus a
maintain_all() sweep that applies one MaintenancePolicy across every
table: the batch analog of the per-table background maintenance loop
(table_handler.rs timers), runnable from cron/Airflow as a single
spark-submit.

Scale shape: table discovery is a directory listing (metadata-sized);
per-table maintenance is the same bounded incremental work the streaming
policy does — tables with no off-curve pressure cost one metadata read.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.types as T
from pyspark.sql import SparkSession

from moonlink_spark.table import MoonTable


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _table_root(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.root, name)

    def create_table(
        self, name: str, schema: T.StructType, key_columns: list[str]
    ) -> MoonTable:
        path = self._table_root(name)
        if os.path.exists(os.path.join(path, "metadata", "version-hint.text")):
            raise ValueError(f"table {name!r} already exists")
        return MoonTable.create(self.spark, path, schema, key_columns=key_columns)

    def load_table(self, name: str) -> MoonTable:
        return MoonTable.load(self.spark, self._table_root(name))

    def list_tables(self) -> list[str]:
        out = []
        for n in sorted(os.listdir(self.root)):
            hint = os.path.join(self.root, n, "metadata", "version-hint.text")
            if os.path.exists(hint):
                out.append(n)
        return out

    def drop_table(self, name: str) -> None:
        if name not in self.list_tables():
            raise KeyError(f"table {name!r} not found")
        shutil.rmtree(self._table_root(name))

    def maintain_all(
        self,
        policy=None,
        expire_retain: int | None = None,
        sweep_grace_seconds: float = 3 * 24 * 3600,
        run_id: str | None = None,
    ) -> dict[str, dict]:
        """One maintenance sweep over every table: policy-triggered
        incremental clustering (see streaming.ingest.MaintenancePolicy),
        then optional snapshot expiry + quarantine orphan sweep. Returns a
        per-table report {clustered_snapshot, expired, swept}. Tables
        without pressure cost one metadata read each."""
        import uuid

        from moonlink_spark.operators.expire import expire_snapshots, sweep_orphans
        from moonlink_spark.streaming.ingest import MaintenancePolicy, maybe_maintain

        from moonlink_spark.observability import (
            detect_drift,
            load_rollup,
            rollup_stage_metrics,
        )

        policy = policy or MaintenancePolicy()
        run_id = run_id or uuid.uuid4().hex[:12]
        report: dict[str, dict] = {}
        for name in self.list_tables():
            t = self.load_table(name)
            entry: dict = {}
            entry["clustered_snapshot"] = maybe_maintain(
                t, policy, run_id=f"{run_id}-{name}"
            )
            if expire_retain is not None:
                entry["expired"] = expire_snapshots(t, retain_last=expire_retain)
                entry["swept"] = len(
                    sweep_orphans(
                        t, quarantine=True, older_than_seconds=sweep_grace_seconds
                    )
                )
            # cross-run stage observability: per-op p50/p95 over every
            # retained lineage record, persisted under metadata/metrics/
            # (observability/iceberg_persistence.rs:61-81 analog); stages
            # whose p95 grew >=1.5x since the previous sweep are flagged so
            # the policy loop sees a slowing stage without scraping lineage
            prev_rollup = load_rollup(t)
            entry["stage_metrics"] = rollup_stage_metrics(t)
            entry["stage_drift"] = detect_drift(prev_rollup, entry["stage_metrics"])
            report[name] = entry
        return report
