from french_admin_etl_spark.streaming.apply import CDCApplyJob, REPOS_SCHEMA
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore

__all__ = ["CDCApplyJob", "CheckpointStore", "REPOS_SCHEMA"]
