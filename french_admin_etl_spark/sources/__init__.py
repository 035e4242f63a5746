from french_admin_etl_spark.sources.csv_source import read_csv_stream_shaped
from french_admin_etl_spark.sources.json_source import read_feature_collection
from french_admin_etl_spark.sources.event_log import EVENT_SCHEMA, EventLog
from french_admin_etl_spark.sources.envelope_log import ENVELOPE_SCHEMA, MultiTableLog

__all__ = [
    "read_csv_stream_shaped",
    "read_feature_collection",
    "EventLog",
    "EVENT_SCHEMA",
    "MultiTableLog",
    "ENVELOPE_SCHEMA",
]
