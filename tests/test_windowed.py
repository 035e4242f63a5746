"""Watermarked windowed aggregation: streaming result == batch oracle,
late-within-delay folded in, too-late dropped."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark.streaming.windowed import windowed_op_counts

SCHEMA = "repo string, path string, lsn long, op string, ts timestamp"


def _rows(*specs):
    # spec: (lsn, op, minute_offset)
    base = pd.Timestamp("2024-01-01 00:00:00")
    return [("r", f"p{lsn}", lsn, op, base + pd.Timedelta(minutes=m)) for lsn, op, m in specs]


def _write(spark, dirname, specs):
    spark.createDataFrame(pd.DataFrame(_rows(*specs), columns=["repo", "path", "lsn", "op", "ts"]),
                          SCHEMA).coalesce(1).write.mode("append").parquet(dirname)


@pytest.mark.filterwarnings("ignore")
def test_streaming_windows_match_batch_and_handle_lateness(spark, tmp_root):
    src = os.path.join(tmp_root, "src")
    os.makedirs(src, exist_ok=True)
    # batch 1: events in windows [0,10) and [10,20)
    _write(spark, src, [(1, "I", 1), (2, "U", 5), (3, "I", 12)])
    # batch 2: on-time event at minute 41 (advances watermark to 41-30=11),
    # plus a LATE event at minute 6 — within the 30min delay → folded in
    _write(spark, src, [(4, "I", 41), (5, "U", 6)])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        windowed_op_counts(stream, window="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per (window, op) = final state
    updates = spark.sql(
        "SELECT * FROM win_counts"
    ).collect()
    final = {}
    for r in updates:
        k = (r["window_start"], r["op"])
        if k not in final or r["n"] >= final[k]["n"]:
            final[k] = r

    # exact batch oracle over the SAME composition (watermark no-op in batch)
    batch = spark.read.schema(SCHEMA).parquet(src)
    exp = {
        (r["window_start"], r["op"]): r
        for r in windowed_op_counts(batch, window="10 minutes").collect()
    }
    assert set(final) == set(exp)
    for k in exp:
        assert final[k]["n"] == exp[k]["n"], k
        assert final[k]["lsn_min"] == exp[k]["lsn_min"] and final[k]["lsn_max"] == exp[k]["lsn_max"]
    # the late-but-within-delay event (lsn 5, minute 6) made it into [0,10)
    w0 = [v for (ws, op), v in final.items() if op == "U" and ws.minute == 0]
    assert w0 and w0[0]["n"] == 2  # lsn 2 (on time) + lsn 5 (late, folded)
