from french_admin_etl_spark.table.lake_table import (
    CommitConflict,
    LakeTable,
    MergeStats,
    SchemaOp,
)

__all__ = ["LakeTable", "MergeStats", "SchemaOp", "CommitConflict"]
