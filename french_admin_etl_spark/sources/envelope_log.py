"""Multi-table change-event log: one ordered stream, a JSON payload envelope.

The reference ingests SEVERAL entity streams that share one pipeline run —
regions, departments, communes, each from its own COG file, loaded in FK
dependency order (``cmd/main.go:110-120`` runs the dimension loaders before
the fact loader). A real binlog/WAL generalizes this: ONE totally-ordered
log carries the change events of every table, each event tagged with its
table name and carrying its row as a JSON payload (the Debezium-envelope
idiom). This source reads that shape:

    (lsn, ts, op, table, payload JSON, schema_version, props)

``for_table`` projects one table's slice back into typed columns via
``from_json`` with the table's logical schema — a single JVM-side
expression, pushed behind the pruning ``table = name`` filter, so each
per-table scan reads only its own rows (at cluster scale the log would be
partitioned by table and the filter becomes partition pruning).

SCHEMA events ride the same stream (null payload; ``props`` carries the
evolution action exactly as in the single-table log) so mid-stream schema
changes stay totally ordered against the data events they precede.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.sources.event_log import LsnLog

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


class MultiTableLog(LsnLog):
    """Envelope-log access: the shared :class:`LsnLog` quartet over
    ``ENVELOPE_SCHEMA`` plus the per-table typed projection. The
    stream's monotone-LSN property (base ``read_stream``) is what the
    DAG driver's per-window FK gates rely on."""

    SCHEMA = ENVELOPE_SCHEMA

    @staticmethod
    def for_table(window: DataFrame, name: str, schema: T.StructType) -> DataFrame:
        """One table's typed slice of an envelope window.

        ``schema`` is the payload parse schema (the table's logical columns,
        possibly extended with columns a SCHEMA event inside this window is
        about to add — see ``DagApplyJob._parse_schema``). Unknown JSON keys
        are ignored and missing ones parse as null, so old and new payload
        shapes coexist in one pass."""
        parsed = window.filter(F.col("table") == name).withColumn(
            "_p", F.from_json(F.col("payload"), schema)
        )
        return parsed.select(
            "lsn",
            "ts",
            "op",
            *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields],
            "schema_version",
            "props",
        )
