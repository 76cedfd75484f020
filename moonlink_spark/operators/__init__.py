from moonlink_spark.operators.alter import alter_table
from moonlink_spark.operators.merge import ConcurrentAppendOverlap, merge_into
from moonlink_spark.operators.compaction import CompactionConfig, compact, plan_compaction
from moonlink_spark.operators.clustering import cluster
from moonlink_spark.operators.expire import expire_snapshots, sweep_orphans
from moonlink_spark.operators.manifest_rewrite import rewrite_manifests
from moonlink_spark.operators.optimize import optimize
from moonlink_spark.operators.rollback import rollback_to

__all__ = [
    "ConcurrentAppendOverlap",
    "rollback_to",
    "alter_table",
    "merge_into",
    "CompactionConfig",
    "compact",
    "plan_compaction",
    "cluster",
    "expire_snapshots",
    "sweep_orphans",
    "rewrite_manifests",
    "optimize",
]
