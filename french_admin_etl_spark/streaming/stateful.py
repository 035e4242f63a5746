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
state store. With ``timeout="ProcessingTimeTimeout"`` every update arms a
per-key idle timer (``state.setTimeoutDuration``); a key receiving no
events within ``timeout_ms`` is handed back with ``state.hasTimedOut``,
its state is REMOVED, and a final ``evicted=True`` row is emitted — so
state size is bounded by the ACTIVE-key working set, not the key
universe (at 10^10 events the key universe would otherwise grow without
bound). With the default ``NoTimeout`` nothing is evicted.
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
        T.StructField("evicted", T.BooleanType(), False),
    ]
)


def make_update(timeout_ms: int | None = None):
    """Build the state-update function; a closure (pickled by value) so
    executors need no package import and the timeout is baked in."""

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (repo, path) = key

        def row(n, mx, deleted, evicted):
            return pd.DataFrame(
                {"repo": [repo], "path": [path], "n_changes": [n],
                 "max_lsn": [mx], "deleted": [deleted], "evicted": [evicted]}
            )

        if timeout_ms is not None and state.hasTimedOut:
            # idle-key eviction: no data arrived within timeout_ms — emit a
            # final marker carrying the last known state, then DROP the
            # state so memory is bounded by the active working set
            n, mx, deleted = state.get if state.exists else (0, -1, False)
            state.remove()
            yield row(n, mx, deleted, True)
            return

        if state.exists:
            n, mx, deleted = state.get
        else:
            n, mx, deleted = 0, -1, False
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            batch_max = int(pdf["lsn"].max())
            if batch_max > mx:
                # the max-LSN event decides liveness (W1 semantics)
                top = pdf.loc[pdf["lsn"].idxmax()]
                deleted = top["op"] == "D"
                mx = batch_max
        state.update((n, mx, deleted))
        if timeout_ms is not None:
            # re-arm the idle timer on every update (ProcessingTimeTimeout
            # requires an explicit duration per invocation)
            state.setTimeoutDuration(timeout_ms)
        yield row(n, mx, deleted, False)

    return _update


def track_key_state(
    events: DataFrame, timeout: str = "NoTimeout", timeout_ms: int = 30_000
) -> DataFrame:
    """events: streaming DF with (repo, path, lsn, op, ...). Returns the
    per-key state updates stream (update output mode); rows with
    ``evicted=True`` mark idle keys whose state was just dropped.

    timeout: 'NoTimeout' (state lives forever) or 'ProcessingTimeTimeout'
    (state evicted after ``timeout_ms`` without events for the key).
    """
    if timeout not in ("NoTimeout", "ProcessingTimeTimeout"):
        raise ValueError(
            f"unsupported timeout {timeout!r}: use NoTimeout or "
            "ProcessingTimeTimeout (EventTimeTimeout needs a watermark "
            "column this operator does not require)"
        )
    fn = make_update(timeout_ms if timeout == "ProcessingTimeTimeout" else None)
    return (
        events.select("repo", "path", "lsn", "op")
        .groupBy("repo", "path")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
