"""Per-partition lineage emission (north_rule: 'per-partition lineage
(source LSN range, rows applied, commit snapshot) and throughput metrics
are emitted each batch')."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from french_admin_etl_spark import datagen
from french_admin_etl_spark.sources.event_log import EVENT_SCHEMA, EventLog
from french_admin_etl_spark.streaming.apply import KEYS, REPOS_SCHEMA, CDCApplyJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable


def test_lineage_rows_per_batch_per_partition(spark, tmp_root):
    ev = datagen.gen_change_events(n_events=2000, n_keys=150, seed=5, delete_rate=0.1)
    log_dir = os.path.join(tmp_root, "events")
    spark.createDataFrame(ev, schema=EVENT_SCHEMA).write.mode("overwrite").parquet(log_dir)

    lineage_dir = os.path.join(tmp_root, "lineage")
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "tbl"), schema=REPOS_SCHEMA, key_cols=KEYS,
        num_buckets=8,
    )
    job = CDCApplyJob(spark, table, lineage_dir=lineage_dir)
    results = job.run_incremental(
        EventLog(spark, log_dir), CheckpointStore(os.path.join(tmp_root, "ck.json")),
        batch_lsns=700,
    )

    lin = spark.read.parquet(lineage_dir)
    assert set(lin.columns) == {
        "partition_id", "lsn_min", "lsn_max", "rows_applied", "rows_deleted",
        "batch_id", "commit_snapshot_id", "wall_ms",
    }
    rows = lin.collect()
    assert rows
    # one group of rows per batch; partition ids within bucket range
    batch_ids = {r["batch_id"] for r in rows}
    assert batch_ids == {r.batch_id for r in results}
    assert all(0 <= r["partition_id"] < 8 for r in rows)
    # LSN ranges nest within each batch's window
    for r in rows:
        lo = r["batch_id"] * 700
        assert lo <= r["lsn_min"] <= r["lsn_max"] < lo + 700
    # totals reconcile with the event log (op counts, dups included)
    data = ev[ev["op"] != "SCHEMA"]
    applied = lin.agg(F.sum("rows_applied")).first()[0]
    deleted = lin.agg(F.sum("rows_deleted")).first()[0]
    assert applied == int((data["op"] != "D").sum())
    assert deleted == int((data["op"] == "D").sum())
    # every lineage row names a real committed snapshot
    versions = {s["version"] for s in table.history()}
    assert {r["commit_snapshot_id"] for r in rows} <= versions
