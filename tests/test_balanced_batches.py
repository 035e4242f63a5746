"""Event-balanced adaptive batching: constant-size micro-batches under
skewed LSN density, identical windows on resume, oracle convergence."""

from __future__ import annotations

import os

import pytest

from french_admin_etl_spark import datagen
from french_admin_etl_spark.sources.event_log import EVENT_SCHEMA, EventLog
from french_admin_etl_spark.streaming.apply import KEYS, REPOS_SCHEMA, CDCApplyJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable


@pytest.fixture(scope="module")
def skewed_log(spark, tmp_path_factory):
    """90% of events packed into the low 10% of the LSN space (bulk-import
    shape): fixed-width LSN windows would give one giant batch + empties."""
    root = str(tmp_path_factory.mktemp("skewed"))
    ev = datagen.gen_change_events(n_events=4000, n_keys=300, seed=23, delete_rate=0.05)
    # re-map LSNs: first 90% of events stay dense (lsn = i), the rest are
    # spread over a 10x larger tail
    n = len(ev)
    cut = int(n * 0.9)
    ev = ev.sort_values("lsn").reset_index(drop=True)
    ev["lsn"] = [i if i < cut else cut + (i - cut) * 100 for i in range(n)]
    log_dir = os.path.join(root, "events")
    spark.createDataFrame(ev, schema=EVENT_SCHEMA).write.mode("overwrite").parquet(log_dir)
    return ev, EventLog(spark, log_dir)


def test_bounds_balance_event_counts(spark, skewed_log):
    ev, log = skewed_log
    bounds = log.event_balanced_bounds(batch_events=1000)
    counts = [
        int(ev[(ev.lsn >= lo) & (ev.lsn < hi)].shape[0])
        for lo, hi in zip(bounds, bounds[1:])
    ]
    assert sum(counts) == len(ev)
    # every batch within 2x of the target despite 100x density skew
    assert all(500 <= c <= 2000 for c in counts), counts
    # fixed-width windows over the same log are pathologically unbalanced
    # (the first window swallows ~90% of the log) — the problem this solves
    span = bounds[-1]
    fixed = [
        int(ev[(ev.lsn >= lo) & (ev.lsn < lo + span // 4)].shape[0])
        for lo in range(0, span, span // 4)
    ]
    assert max(fixed) > 3000


def test_balanced_apply_converges_and_resumes_identically(spark, tmp_root, skewed_log):
    ev, log = skewed_log
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), REPOS_SCHEMA, KEYS,
        num_buckets=4, write_mode="mor",
    )
    job = CDCApplyJob(spark, table)
    ckpt = CheckpointStore(os.path.join(tmp_root, "ck.json"))
    r1 = job.run_incremental_balanced(log, ckpt, batch_events=1000, max_batches=2)
    assert len(r1) == 2
    planned = ckpt.load()["bounds"]
    # crash + resume: the remaining windows come from the checkpoint,
    # byte-identical to the originally planned ones
    r2 = job.run_incremental_balanced(log, ckpt, batch_events=999999)
    assert ckpt.load()["bounds"] == planned
    assert len(r1) + len(r2) == len(planned) - 1

    exp = {
        (r.repo, r.path): r.content_sha
        for r in datagen.expected_final_state(ev).itertuples()
    }
    got = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.read().select("repo", "path", "content_sha").collect()
    }
    assert got == exp

    # full replay with a fresh checkpoint: every batch fenced, state fixed
    r3 = job.run_incremental_balanced(
        log, CheckpointStore(os.path.join(tmp_root, "ck2.json")), batch_events=1000
    )
    assert all(r.merge is not None and r.merge.fenced for r in r3)
