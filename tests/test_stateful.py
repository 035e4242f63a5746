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
