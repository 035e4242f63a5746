from french_admin_etl_spark.streaming.apply import CDCApplyJob, REPOS_SCHEMA
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.streaming.dag import DagApplyJob, FKEdge, FKViolation
from french_admin_etl_spark.streaming.stateful import track_key_state
from french_admin_etl_spark.streaming.windowed import windowed_op_counts

__all__ = [
    "CDCApplyJob",
    "CheckpointStore",
    "DagApplyJob",
    "FKEdge",
    "FKViolation",
    "REPOS_SCHEMA",
    "track_key_state",
    "windowed_op_counts",
]
