"""moonlink_spark — a PySpark-native Iceberg-style table-maintenance engine.

Built from scratch with the *capabilities* of dentiny/moonlink (studied at
/root/reference): MERGE INTO upserts mirroring moonlink's CDC apply semantics,
bin-packing small-file compaction with size-tiered selection, Z-order/Hilbert
clustering, manifest rewrite with per-file min/max stats, snapshot expiry with
reachability-based orphan sweep, and snapshot-isolated reads.

This is NOT a port: moonlink is a single-node Rust event loop
(reference: src/moonlink/src/table_handler.rs); here every operator is a
deterministic PySpark DataFrame program designed for multi-executor clusters.
"""

from moonlink_spark.table import MoonTable
from moonlink_spark.catalog.catalog import FileCatalog

__all__ = ["MoonTable", "FileCatalog"]
__version__ = "0.1.0"
