"""Watermarked time-window aggregation over the change stream.

The CDC metrics side-channel (reference: the processor's throughput log
line, ``csv_processor.go:131``) generalized to event-time analytics:
tumbling/sliding window counts per key with a watermark so late events
are folded in while state stays bounded.

Scale notes: ``withWatermark`` bounds the streaming state store — windows
older than (max event time − delay) are finalized and EVICTED, so state is
O(active windows × keys), independent of stream length; without it a
10^10-event stream accretes state forever. The aggregation itself is a
combinable hash-agg (map-side partial) shuffled on (key, window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "op",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(key, event-time window) op counts + LSN range.

    Works on BOTH a streaming frame (watermark bounds state; late rows
    inside the delay still update their window, later ones are dropped)
    and a batch frame (watermark is a no-op there, enabling exact batch
    oracles for the same plan). Returns window bounds flattened to
    columns so sinks/oracles see a flat schema.
    """
    win = F.window(F.col(time_col), window, slide or window)
    out = (
        events.withWatermark(time_col, watermark)
        .groupBy(win.alias("_w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
        )
    )
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        key_col,
        "n",
        "lsn_min",
        "lsn_max",
    )
