"""Lake-to-lake cascade: downstream tables maintained incrementally from
an upstream table's changes() window, with full-resync fallback."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from french_admin_etl_spark.streaming.apply import KEYS, REPOS_SCHEMA
from french_admin_etl_spark.streaming.cascade import CascadeJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable

_COLS = (
    "repo string, path string, commit string, lang string, content string,"
    " content_sha string, lsn long, op string"
)


def _mk(spark, tmp_root, name, **kw):
    return LakeTable.create(
        spark, os.path.join(tmp_root, name), schema=REPOS_SCHEMA, key_cols=KEYS,
        num_buckets=4, write_mode="mor", **kw
    )


def _state(t):
    return {
        (r["repo"], r["path"]): (r["content"], r["lang"])
        for r in t.read().collect()
    }


def test_cascade_bootstrap_incremental_and_fallback(spark, tmp_root):
    source = _mk(spark, tmp_root, "src", properties={"compact.max-delta-files": 999})
    target = _mk(spark, tmp_root, "dst")
    job = CascadeJob(spark, source, target)
    ckpt = CheckpointStore(os.path.join(tmp_root, "cascade.ck"))

    # 1. bootstrap: pre-existing rows reach the target via full resync
    source.merge(
        spark.createDataFrame(
            [("r", "a", "c", "py", "v1", "s1", 1, "I"),
             ("r", "b", "c", "go", "w1", "t1", 2, "I")], _COLS
        ),
        batch_id=0,
    )
    r = job.run_once(ckpt)
    assert r.mode == "full_resync" and _state(target) == _state(source)

    # 2. incremental: only the new commits flow, deletes included
    source.merge(
        spark.createDataFrame(
            [("r", "a", "c", "py", "v2", "s2", 3, "U"),
             ("r", "b", None, None, None, None, 4, "D")], _COLS
        ),
        batch_id=1,
    )
    r = job.run_once(ckpt)
    assert r.mode == "incremental"
    assert _state(target) == _state(source) == {("r", "a"): ("v2", "py")}

    # 3. nothing new → noop
    assert job.run_once(ckpt).mode == "noop"

    # 4. crash replay: rewind the checkpoint → the merge is fenced,
    # state unchanged (exactly-once across the cascade hop)
    ckpt.save({"from_version": r.from_version, "batch_id": r.batch_id})
    r2 = job.run_once(ckpt)
    assert r2.merge is not None and r2.merge.fenced
    assert _state(target) == _state(source)

    # 5. upstream compaction folds the window → full-resync fallback,
    # still convergent (incl. a post-compaction delete)
    source.compact()
    source.merge(
        spark.createDataFrame(
            [("r", "c", "c", "rs", "x1", "u1", 5, "I")], _COLS
        ),
        batch_id=2,
    )
    r3 = job.run_once(ckpt)
    assert r3.mode == "full_resync"
    assert _state(target) == _state(source)


def test_cascade_transform_seam(spark, tmp_root):
    """The transform hook (U3 analog) reshapes the change stream between
    tables — here a normalization (upper-cased lang) on the silver hop."""
    source = _mk(spark, tmp_root, "tsrc")
    target = _mk(spark, tmp_root, "tdst")
    job = CascadeJob(
        spark, source, target,
        transform=lambda df: df.withColumn("lang", F.upper("lang")),
    )
    ckpt = CheckpointStore(os.path.join(tmp_root, "tcascade.ck"))
    source.merge(
        spark.createDataFrame([("r", "a", "c", "py", "v1", "s1", 1, "I")], _COLS),
        batch_id=0,
    )
    job.run_once(ckpt)
    assert _state(target) == {("r", "a"): ("v1", "PY")}
    source.merge(
        spark.createDataFrame([("r", "a", "c", "go", "v2", "s2", 2, "U")], _COLS),
        batch_id=1,
    )
    r = job.run_once(ckpt)
    assert r.mode == "incremental"
    assert _state(target) == {("r", "a"): ("v2", "GO")}


def test_cascade_crash_between_merge_and_checkpoint_replays_same_window(spark, tmp_root):
    """Reviewer finding: if the source advances between a crash (after
    merge, before checkpoint) and the retry, recomputing the window would
    mark the newer commits as applied while the fenced merge skipped
    them. The pending-window protocol replays the ORIGINAL window, then a
    second run picks up the rest — nothing is ever skipped."""
    source = _mk(spark, tmp_root, "csrc")
    target = _mk(spark, tmp_root, "cdst")
    job = CascadeJob(spark, source, target)
    ckpt = CheckpointStore(os.path.join(tmp_root, "crash.ck"))

    source.merge(
        spark.createDataFrame([("r", "a", "c", "py", "v1", "s1", 1, "I")], _COLS),
        batch_id=0,
    )
    r0 = job.run_once(ckpt)  # bootstrap applied, checkpoint advanced
    # simulate the crash: rewind to the pre-run state WITH the pending
    # window recorded (exactly what run_once persists before merging)
    ckpt.save({"from_version": r0.from_version, "batch_id": r0.batch_id,
               "pending": {"to_version": r0.to_version}})
    # source advances while "down"
    source.merge(
        spark.createDataFrame([("r", "b", "c", "go", "w1", "t1", 2, "I")], _COLS),
        batch_id=1,
    )
    r1 = job.run_once(ckpt)  # must replay the ORIGINAL window (fenced)
    assert r1.to_version == r0.to_version
    assert r1.merge is not None and r1.merge.fenced
    assert ckpt.load()["from_version"] == r0.to_version
    r2 = job.run_once(ckpt)  # now the post-crash commit flows
    assert r2.mode == "incremental" and not r2.merge.fenced
    assert _state(target) == _state(source)
    assert job.run_once(ckpt).mode == "noop"


def test_cascade_coalesce_source_falls_back_to_resync(spark, tmp_root):
    """A coalesce-mode upstream window is refused by changes() (its nulls
    mean 'not updated'); the cascade must fall back to full resync and
    still converge — never clobber downstream columns with nulls."""
    source = _mk(spark, tmp_root, "qsrc")
    target = _mk(spark, tmp_root, "qdst")
    job = CascadeJob(spark, source, target)
    ckpt = CheckpointStore(os.path.join(tmp_root, "q.ck"))
    source.merge(
        spark.createDataFrame([("r", "a", "c1", "py", "v1", "s1", 1, "I")], _COLS),
        batch_id=0, mode="coalesce",
    )
    job.run_once(ckpt)
    # partial update upstream: only content changes
    source.merge(
        spark.createDataFrame([("r", "a", None, None, "v2", None, 2, "U")], _COLS),
        batch_id=1, mode="coalesce",
    )
    r = job.run_once(ckpt)
    assert r.mode == "full_resync"  # changes() refused the coalesce window
    assert _state(target) == _state(source)
    assert {r2["path"]: r2["lang"] for r2 in target.read().collect()} == {"a": "py"}


def test_two_hop_medallion_pipeline(spark, tmp_root):
    """Bronze → silver → gold: two concurrent writers feed bronze (disjoint
    log partitions), the silver hop normalizes (upper-cases lang) via the
    transform seam, the gold hop filters to one language — each hop tailed
    incrementally through changes() with its own checkpoint. After a second
    ingest wave both downstream tables converge incrementally (no resync)."""
    import threading

    import pandas as pd

    from french_admin_etl_spark import datagen
    from french_admin_etl_spark.sources.event_log import EVENT_SCHEMA, EventLog
    from french_admin_etl_spark.streaming.apply import CDCApplyJob

    bronze = _mk(spark, tmp_root, "bronze", properties={"compact.max-delta-files": 999})
    silver = _mk(spark, tmp_root, "silver")
    gold = _mk(spark, tmp_root, "gold")
    s_job = CascadeJob(
        spark, bronze, silver,
        transform=lambda df: df.withColumn("lang", F.upper("lang")),
        writer_id="to_silver",
    )
    g_job = CascadeJob(
        spark, silver, gold,
        transform=lambda df: df.filter((F.col("lang") == "PYTHON") | (F.col("op") == "D")),
        writer_id="to_gold",
    )
    s_ck = CheckpointStore(os.path.join(tmp_root, "s.ck"))
    g_ck = CheckpointStore(os.path.join(tmp_root, "g.ck"))

    evs = {}

    def ingest(wave_seed, lsn_offset):
        """Two writers apply disjoint key universes into bronze concurrently.
        Each (writer, wave) gets its OWN writer_id — a fresh batch-id
        sequence needs a fresh fence namespace (per-writer fencing would
        correctly drop a reused sequence as replays) — and each wave's
        LSNs sit strictly above the previous wave's."""
        errs = []

        def worker(w, seed):
            try:
                ev = datagen.gen_change_events(
                    n_events=1200, n_keys=120, seed=seed, key_ns=w, delete_rate=0.05
                )
                ev["lsn"] = ev["lsn"] + lsn_offset
                evs.setdefault(w, []).append(ev)
                log_dir = os.path.join(tmp_root, f"log_{w}_{seed}")
                spark.createDataFrame(ev, schema=EVENT_SCHEMA).write.mode(
                    "overwrite"
                ).parquet(log_dir)
                job = CDCApplyJob(
                    spark, LakeTable(spark, bronze.root), writer_id=f"{w}_{seed}"
                )
                job.run_incremental(
                    EventLog(spark, log_dir),
                    CheckpointStore(os.path.join(tmp_root, f"{w}_{seed}.ck")),
                    batch_lsns=400 + lsn_offset,  # windows sized to the wave
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [
            threading.Thread(target=worker, args=(w, wave_seed + i))
            for i, w in enumerate(("wa", "wb"))
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs

    # wave 1: bootstrap both hops
    ingest(60, 0)
    assert s_job.run_once(s_ck).mode == "full_resync"
    assert g_job.run_once(g_ck).mode == "full_resync"
    # wave 2: must flow INCREMENTALLY through both hops
    ingest(70, 100_000)
    r_s = s_job.run_once(s_ck)
    r_g = g_job.run_once(g_ck)
    assert r_s.mode == "incremental" and r_g.mode == "incremental"

    # oracle: bronze vs pandas replay; silver = bronze w/ upper lang;
    # gold = silver restricted to PY
    allev = pd.concat([e for ws in evs.values() for e in ws], ignore_index=True)
    exp = datagen.expected_final_state(allev)
    b_state = {
        (r["repo"], r["path"]): (r["lang"], r["content_sha"])
        for r in bronze.read().collect()
    }
    assert b_state == {
        (r.repo, r.path): (r.lang, r.content_sha) for r in exp.itertuples()
    }
    s_state = {
        (r["repo"], r["path"]): (r["lang"], r["content_sha"])
        for r in silver.read().collect()
    }
    assert s_state == {
        (r.repo, r.path): (r.lang.upper(), r.content_sha) for r in exp.itertuples()
    }
    g_state = {(r["repo"], r["path"]) for r in gold.read().collect()}
    assert g_state == {
        (r.repo, r.path) for r in exp.itertuples() if r.lang.upper() == "PYTHON"
    }
    assert g_state  # the filter actually kept something


def test_cascade_resync_retracts_vacuumed_deletes(spark, tmp_root):
    """A delete whose tombstone was compacted + vacuumed away BEFORE the
    lagging cascade consumed it is invisible to the resync replay (the
    key is simply absent from the source state) — the resync must
    therefore RETRACT target keys missing from the source, or the
    target's live row survives forever (review finding)."""
    source = _mk(spark, tmp_root, "vsrc")
    target = _mk(spark, tmp_root, "vdst")
    job = CascadeJob(spark, source, target)
    ckpt = CheckpointStore(os.path.join(tmp_root, "vcascade.ck"))
    source.merge(
        spark.createDataFrame(
            [("r", "a", "c", "py", "v1", "s1", 1, "I"),
             ("r", "b", "c", "go", "w1", "t1", 2, "I")], _COLS
        ),
        batch_id=0,
    )
    job.run_once(ckpt)
    assert _state(target) == _state(source)

    # the delete lands, then compaction folds the cascade's pending
    # window AND the tombstone is vacuumed — all before the cascade runs
    source.merge(
        spark.createDataFrame([("r", "b", None, None, None, None, 3, "D")], _COLS),
        batch_id=1,
    )
    source.compact()
    source.vacuum_tombstones(watermark_lsn=10)
    assert not [
        r for r in source.read_raw().collect() if r["_deleted"]
    ], "tombstone should be physically gone"

    r = job.run_once(ckpt)
    assert r.mode == "full_resync"
    assert _state(target) == _state(source) == {("r", "a"): ("v1", "py")}


def test_cascade_expired_pending_snapshot_recovers(spark, tmp_root):
    """A crash leaves a pending window pinned to version V; before the
    replay runs, expire_snapshots drops V's metadata. Every rerun used to
    re-raise FileNotFoundError forever (review finding). Two recoveries:
    if the pending merge COMMITTED (fence advanced), the checkpoint jumps
    past it; if it never committed, the window is re-planned live."""
    source = _mk(spark, tmp_root, "esrc", properties={"compact.max-delta-files": 999})
    target = _mk(spark, tmp_root, "edst")
    job = CascadeJob(spark, source, target)
    ck_path = os.path.join(tmp_root, "ecascade.ck")
    ckpt = CheckpointStore(ck_path)
    source.merge(
        spark.createDataFrame([("r", "a", "c", "py", "v1", "s1", 1, "I")], _COLS),
        batch_id=0,
    )
    r0 = job.run_once(ckpt)  # bootstrap committed at some version V
    v_pinned = r0.to_version

    # CASE 1: crash between merge and checkpoint — rewind to pending@V,
    # then advance the source far enough that expire_snapshots drops V
    ckpt.save({"from_version": r0.from_version, "batch_id": r0.batch_id,
               "pending": {"to_version": v_pinned}})
    for i in range(12):
        source.merge(
            spark.createDataFrame(
                [("r", f"k{i}", "c", "py", f"x{i}", f"h{i}", 10 + i, "I")], _COLS
            ),
            batch_id=2 + i,
        )
    source.expire_snapshots(keep_last=3)
    import pytest

    with pytest.raises(FileNotFoundError):
        source.snapshot(v_pinned)  # the pin is really gone
    r1 = job.run_once(ckpt)
    assert r1.mode == "recovered" and r1.to_version == v_pinned
    r2 = job.run_once(ckpt)
    assert r2.mode in ("incremental", "full_resync")
    assert _state(target) == _state(source)

    # CASE 2: pending pinned to an expired version whose merge NEVER
    # committed (fence behind the pending batch_id) → re-plan live
    st = ckpt.load()
    gone = v_pinned  # expired version; batch_id far ahead of the fence
    ckpt.save({"from_version": st["from_version"], "batch_id": 999,
               "pending": {"to_version": gone}})
    r3 = job.run_once(ckpt)
    assert r3.mode in ("noop", "incremental", "full_resync")
    assert _state(target) == _state(source)
