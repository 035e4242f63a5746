from french_admin_etl_spark.operators.dedup import dedup_max_seq, dedup_max_seq_window
from french_admin_etl_spark.operators.filters import allow_list_filter, allow_list_predicate
from french_admin_etl_spark.operators.validate import validate_split
from french_admin_etl_spark.operators.pivot import pivot_last_write_wins
from french_admin_etl_spark.operators.salting import add_salt, hot_keys

__all__ = [
    "dedup_max_seq",
    "dedup_max_seq_window",
    "allow_list_filter",
    "allow_list_predicate",
    "validate_split",
    "pivot_last_write_wins",
    "add_salt",
    "hot_keys",
]
