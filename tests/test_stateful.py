"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark import datagen
from french_admin_etl_spark.sources.event_log import EVENT_SCHEMA
from french_admin_etl_spark.streaming.stateful import track_key_state


@pytest.mark.filterwarnings("ignore")
def test_track_key_state_converges_across_microbatches(spark, tmp_root):
    ev = datagen.gen_change_events(
        n_events=600, n_keys=40, seed=3, delete_rate=0.1, shuffle_window=30
    )
    log_dir = os.path.join(tmp_root, "events")
    # several files → several micro-batches with maxFilesPerTrigger
    spark.createDataFrame(ev, schema=EVENT_SCHEMA).repartition(6).write.mode(
        "overwrite"
    ).parquet(log_dir)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(log_dir)
        .filter(F.col("op") != "SCHEMA")
    )
    q = (
        track_key_state(stream)
        .writeStream.format("memory")
        .queryName("key_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per key across all micro-batches = final state
    updates = spark.sql("SELECT * FROM key_state").collect()
    assert updates, "no state updates emitted"
    final = {}
    for r in updates:
        k = (r["repo"], r["path"])
        if k not in final or r["max_lsn"] >= final[k]["max_lsn"]:
            final[k] = r

    data = ev[ev["op"] != "SCHEMA"]
    by_key = data.sort_values("lsn").groupby(["repo", "path"])
    exp_counts = by_key.size().to_dict()
    exp_last = by_key.tail(1).set_index(["repo", "path"])

    assert len(final) == len(exp_counts)
    for k, row in final.items():
        assert row["n_changes"] == exp_counts[k]
        assert row["max_lsn"] == int(exp_last.loc[k, "lsn"])
        assert row["deleted"] == (exp_last.loc[k, "op"] == "D")


class _FakeState:
    """Deterministic GroupState stand-in for unit-testing the update fn."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set_ms = None

    @property
    def exists(self):
        return self._value is not None and not self.removed

    @property
    def get(self):
        assert self.exists
        return self._value

    def update(self, v):
        self._value = v
        self.removed = False

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set_ms = ms


def test_timeout_eviction_removes_state_and_emits_marker():
    """hasTimedOut invocation → state.remove() + a final evicted=True row
    carrying the last known state (bounded-state claim, NOTES round 1)."""
    from french_admin_etl_spark.streaming.stateful import make_update

    fn = make_update(timeout_ms=500)
    st = _FakeState(value=(7, 42, False), timed_out=True)
    out = list(fn(("r", "p"), iter([]), st))
    assert st.removed, "timed-out key's state must be removed"
    assert len(out) == 1
    row = out[0].iloc[0]
    assert bool(row["evicted"]) and row["n_changes"] == 7 and row["max_lsn"] == 42


def test_timeout_rearmed_on_every_update():
    import pandas as pd

    from french_admin_etl_spark.streaming.stateful import make_update

    fn = make_update(timeout_ms=500)
    st = _FakeState()
    pdf = pd.DataFrame({"lsn": [1, 2], "op": ["I", "U"]})
    out = list(fn(("r", "p"), iter([pdf]), st))
    assert st.timeout_set_ms == 500, "idle timer must be re-armed per update"
    assert st._value == (2, 2, False)
    assert not bool(out[0].iloc[0]["evicted"])


def test_no_timeout_mode_never_arms_timer():
    import pandas as pd

    from french_admin_etl_spark.streaming.stateful import make_update

    fn = make_update(timeout_ms=None)
    st = _FakeState()
    list(fn(("r", "p"), iter([pd.DataFrame({"lsn": [5], "op": ["D"]})]), st))
    assert st.timeout_set_ms is None
    assert st._value == (1, 5, True)


@pytest.mark.filterwarnings("ignore")
def test_processing_time_timeout_evicts_idle_keys_in_stream(spark, tmp_root):
    """End-to-end: key seen only in batch 1 is evicted (evicted=True row)
    after the idle window passes while later batches keep the clock moving."""
    import time

    import pandas as pd

    from french_admin_etl_spark.streaming.stateful import track_key_state

    src_dir = os.path.join(tmp_root, "src")
    os.makedirs(src_dir, exist_ok=True)
    schema = "repo string, path string, lsn long, op string"

    def write_file(name, rows):
        spark.createDataFrame(pd.DataFrame(rows), schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        _ = name

    write_file("b1", {"repo": ["r"], "path": ["idle"], "lsn": [1], "op": ["I"]})

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
    q = (
        track_key_state(stream, timeout="ProcessingTimeTimeout", timeout_ms=800)
        .writeStream.format("memory")
        .queryName("evict_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "ck_evict"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.monotonic() + 90
        evicted = []
        wrote = 0
        while time.monotonic() < deadline and not evicted:
            time.sleep(1.5)
            # keep feeding OTHER keys so micro-batches (and the processing-
            # time clock) keep advancing past the idle key's timer
            wrote += 1
            write_file(
                f"b{wrote + 1}",
                {"repo": ["r"], "path": [f"active{wrote}"], "lsn": [wrote + 1],
                 "op": ["U"]},
            )
            evicted = spark.sql(
                "SELECT * FROM evict_state WHERE path = 'idle' AND evicted"
            ).collect()
        assert evicted, "idle key was never evicted within the deadline"
        assert evicted[0]["n_changes"] == 1 and evicted[0]["max_lsn"] == 1
    finally:
        q.stop()
