"""RESTORE rollback + metadata tables (snapshots_df / files_df) + the
maintain CLI surfaces for rebucket / zorder / restore."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.table.lake_table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ST = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
)


def _src(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, lsn long, op string")


def _state(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_restore_reverts_state_fences_and_layout(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "r"), ST, ["k"], num_buckets=2, write_mode="mor"
    )
    t.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    good_v = t.current_version()
    good = _state(t)
    # the bad window: an update wave + a layout change
    bad_batch = _src(spark, [("a", 666, 10, "U"), ("c", 3, 11, "I")])
    t.merge(bad_batch, batch_id=1)
    t.rebucket(8)
    assert _state(t) != good

    v = t.restore(good_v)
    assert v == t.current_version()
    assert _state(t) == good
    assert t.snapshot()["num_buckets"] == 2  # layout reverted too
    # fences reverted WITH the state: replaying the undone batch APPLIES
    # (no silent fence-out gap) and reconverges
    s = t.merge(bad_batch, batch_id=1)
    assert not s.fenced
    assert _state(t) == {"a": 666, "b": 2, "c": 3}
    # the bad window stays time-travelable until expiry, so its files are
    # still referenced — vacuum must not eat them
    assert t.vacuum_orphans(min_age_sec=0) == 0
    assert _state(t) == {"a": 666, "b": 2, "c": 3}
    # restoring to the current version is a no-op
    cur = t.current_version()
    assert t.restore(cur) == cur


def test_metadata_tables(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "m"), ST, ["k"], num_buckets=2, write_mode="mor"
    )
    t.merge(_src(spark, [(f"k{i}", i, i + 1, "I") for i in range(20)]), batch_id=0)
    t.merge(_src(spark, [("k1", 100, 100, "U")]), batch_id=1)

    snaps = {r["version"]: r for r in t.snapshots_df().collect()}
    assert set(snaps) == {s["version"] for s in t.history()}
    cur = snaps[t.current_version()]
    assert cur["delta_groups"] >= 1 and cur["rows"] == 21
    assert json.loads(cur["properties"])["last_batch_id"] == 1

    files = t.files_df().collect()
    snap = t.snapshot()
    assert len(files) == sum(len(g["files"]) for g in snap["file_groups"])
    assert {r["bucket"] for r in files} == {g["bucket"] for g in snap["file_groups"]}
    # layout + stats surface after a sorted rewrite
    t.optimize_sort(["v"])
    files2 = t.files_df().collect()
    assert all(json.loads(r["layout"]) == ["v"] for r in files2)
    assert all(r["stats"] and "v" in json.loads(r["stats"]) for r in files2)
    assert not any(r["delta"] for r in files2)
    # an empty table yields empty metadata frames, not an inference error
    t2 = LakeTable.create(
        spark, os.path.join(tmp_root, "m2"), ST, ["k"], num_buckets=2
    )
    assert t2.files_df().count() == 0 and t2.snapshots_df().count() == 1


def test_maintain_cli_rebucket_zorder_restore(spark, tmp_root, monkeypatch, capsys):
    sys.path.insert(0, REPO)
    import app

    root = os.path.join(tmp_root, "cli")
    t = LakeTable.create(
        spark, root,
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
        ]),
        ["k"], num_buckets=2, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame(
            [(f"k{i}", i, 40 - i, i + 1, "I") for i in range(40)],
            "k string, x long, y long, lsn long, op string",
        ),
        batch_id=0,
    )
    before = {r["k"] for r in t.read().collect()}
    v0 = t.current_version()

    argv = ["app.py", "maintain", "--table-root", root,
            "--rebucket", "8", "--zorder", "x,y", "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rebucketed_to_version"] and report["zorder_version"]
    assert t.snapshot()["num_buckets"] == 8
    assert all(g.get("zorder") == ["x", "y"] for g in t.snapshot()["file_groups"])
    assert {r["k"] for r in t.read().collect()} == before

    argv = ["app.py", "maintain", "--table-root", root, "--restore", str(v0),
            "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["restored_to_version"] == t.current_version()
    assert t.snapshot()["num_buckets"] == 2
    assert {r["k"] for r in t.read().collect()} == before


def test_restore_refuses_cdf_and_forces_view_resync(spark, tmp_root):
    """The review scenario: a rollback window must NOT read as an empty
    (or upsert-only) change window — changes() refuses, and a maintained
    view resyncs to the restored truth instead of silently keeping
    rolled-back rows."""
    from french_admin_etl_spark.streaming.joinview import JoinView

    left = LakeTable.create(
        spark, os.path.join(tmp_root, "jl"),
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("fk", T.StringType()),
        ]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    dim = LakeTable.create(
        spark, os.path.join(tmp_root, "jd"),
        T.StructType([
            T.StructField("code", T.StringType()),
            T.StructField("label", T.StringType()),
        ]),
        ["code"], num_buckets=2, write_mode="mor",
    )
    dim.merge(
        spark.createDataFrame([("d1", "x", 1, "I")], "code string, label string, lsn long, op string"),
        batch_id=0,
    )
    left.merge(
        spark.createDataFrame([("a", "d1", 1, "I")], "id string, fk string, lsn long, op string"),
        batch_id=0,
    )
    good_v = left.current_version()
    jv = JoinView.create(
        spark, left, dim, os.path.join(tmp_root, "jv"), on=[("fk", "code")],
        select={"label": "label"},
    )
    jv.sync()
    # the bad window: key b inserted, then rolled back
    left.merge(
        spark.createDataFrame([("b", "d1", 2, "I")], "id string, fk string, lsn long, op string"),
        batch_id=1,
    )
    jv.sync()
    assert {r["id"] for r in jv.read().collect()} == {"a", "b"}
    v_before_restore = left.current_version()
    left.restore(good_v)
    # CDF across the rollback refuses (both delta and base restored
    # groups are marked)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compacted away"):
        left.changes(v_before_restore).collect()
    r = jv.sync()
    assert r["mode"] == "resync"
    assert {r2["id"] for r2 in jv.read().collect()} == {"a"}  # b is gone
    # resolution order survived the restamp: a's row still enriches
    assert {r2["id"]: r2["label"] for r2 in jv.read().collect()} == {"a": "x"}
    # incremental service resumes after the restore resync
    left.merge(
        spark.createDataFrame([("c", "d1", 9, "I")], "id string, fk string, lsn long, op string"),
        batch_id=9,
    )
    assert jv.sync()["mode"] == "incremental"
    assert {r2["id"] for r2 in jv.read().collect()} == {"a", "c"}


def test_shallow_clone_zero_copy_divergence(spark, tmp_root):
    """Shallow clone: instant full-size copy by reference; writes on
    either side never touch the other; fences carry over (behavioral
    parity for replay tests); the clone's own vacuum is safe."""
    src = LakeTable.create(
        spark, os.path.join(tmp_root, "src"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    src.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    clone = src.clone(os.path.join(tmp_root, "dev"))
    assert _state(clone) == {"a": 1, "b": 2}
    assert clone.current_version() == 1
    # no data files were copied
    assert os.listdir(os.path.join(tmp_root, "dev", "data")) == []

    # divergence: each side only sees its own writes
    clone.merge(_src(spark, [("a", 100, 10, "U"), ("c", 3, 11, "I")]), batch_id=1)
    src.merge(_src(spark, [("b", 200, 10, "U")]), batch_id=1)
    assert _state(clone) == {"a": 100, "b": 2, "c": 3}
    assert _state(src) == {"a": 1, "b": 200}
    # fences carried: replaying the source's batch 0 against the clone
    # fences out, exactly as on the source
    assert clone.merge(_src(spark, [("a", 999, 99, "U")]), batch_id=0).fenced
    # the clone's vacuum only governs its own data dir — the referenced
    # source files survive, and a clone compaction localizes the state
    assert clone.vacuum_orphans(min_age_sec=0) == 0
    clone.compact(include_clean=True)
    assert _state(clone) == {"a": 100, "b": 2, "c": 3}
    assert not any(
        os.path.isabs(f) for g in clone.snapshot()["file_groups"] for f in g["files"]
    )
    assert _state(src) == {"a": 1, "b": 200}  # source untouched throughout


def test_deep_clone_survives_source_removal(spark, tmp_root):
    import shutil as _shutil

    src = LakeTable.create(
        spark, os.path.join(tmp_root, "src2"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    src.merge(_src(spark, [("a", 1, 1, "I")]), batch_id=0)
    clone = src.clone(os.path.join(tmp_root, "deep"), deep=True)
    _shutil.rmtree(os.path.join(tmp_root, "src2"))  # source gone entirely
    assert _state(clone) == {"a": 1}
    with pytest.raises(ValueError, match="already has a table"):
        clone.clone(os.path.join(tmp_root, "deep"))


def test_restore_races_concurrent_mor_writer(spark, tmp_root):
    """A writer's commit loses the version race to a restore() that both
    rolls back state AND reverts the bucket layout: the rebase loop must
    restage under the restored layout and land the batch ON TOP of the
    restored state (the operator rolled back, the stream keeps going)."""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "rr"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    t.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    good_v = t.current_version()
    t.merge(_src(spark, [("c", 3, 3, "I")]), batch_id=1)
    t.rebucket(8)

    real_commit = t._commit
    raced = {}

    def racing_commit(snap):
        if "done" not in raced and snap.get("num_buckets") == 8:
            raced["done"] = True
            LakeTable(t.spark, t.root).restore(good_v)  # back to nb=2
        real_commit(snap)

    t._commit = racing_commit
    try:
        stats = t.merge(_src(spark, [("d", 4, 10, "I")]), batch_id=2)
    finally:
        t._commit = real_commit
    assert raced.get("done") and not stats.fenced
    snap = t.snapshot()
    assert snap["num_buckets"] == 2  # the restored layout won
    # restored state (c rolled back) + the racing batch's row
    assert _state(t) == {"a": 1, "b": 2, "d": 4}
    # and the row is findable through the layout-pruned point-read path
    assert {r["k"]: r["v"] for r in t.lookup([("d",)]).collect()} == {"d": 4}


def test_restore_to_empty_snapshot_still_refuses_cdf(spark, tmp_root):
    """Second review pass: restoring to a snapshot with ZERO file groups
    leaves no group to carry the 'restored' marker — the recorded
    restore version must refuse the window anyway."""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "re"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    empty_v = t.current_version()
    t.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    consumer_synced = t.current_version()
    t.restore(empty_v)
    t.merge(_src(spark, [("c", 3, 3, "I")]), batch_id=1)
    with pytest.raises(ValueError, match="restored over"):
        t.changes(consumer_synced).collect()
    assert _state(t) == {"c": 3}


def test_double_restore_preserves_intra_branch_tie_order(spark, tmp_root):
    """Second review pass: the old multiplicative sub-fold inverted group
    order once subs crossed the base; the dense renumbering must keep an
    equal-LSN tie resolving to the LATER staged commit through repeated
    restores."""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "dr"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    t.merge(_src(spark, [("a", 0, 1, "I")]), batch_id=0)
    br = t.branch("audit")
    br.merge(_src(spark, [("a", 100, 50, "U")]), batch_id=0)
    br.merge(_src(spark, [("a", 200, 50, "U")]), batch_id=1)
    br.publish()
    assert _state(t)["a"] == 200
    good_v = t.current_version()
    t.merge(_src(spark, [("z", 9, 90, "I")]), batch_id=2)
    t.restore(good_v)
    assert _state(t) == {"a": 200}  # tie order survived restore #1
    v2 = t.current_version()
    t.merge(_src(spark, [("z", 9, 91, "I")]), batch_id=3)
    t.restore(v2)
    assert _state(t) == {"a": 200}  # and restore #2 (folded subs re-fold)


def test_clone_restamps_into_own_version_chain(spark, tmp_root):
    """Second review pass: source seq stamps carried verbatim would let a
    stale source group outrank the clone's own later commits in the
    equal-LSN tie-break, and leak source-era groups into the clone's
    changes() windows."""
    src = LakeTable.create(
        spark, os.path.join(tmp_root, "cs"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    # several commits so source delta seqs run well past 2
    for i in range(5):
        src.merge(_src(spark, [("a", i, 10 + i, "U"), (f"k{i}", i, 20 + i, "I")]), batch_id=i)
    clone = src.clone(os.path.join(tmp_root, "cd"))
    assert all(g["seq"] == 1 for g in clone.snapshot()["file_groups"])
    # equal-LSN correction on the clone: later commit (seq=2) must WIN
    # against the source-era row at the same lsn
    clone.merge(_src(spark, [("a", 999, 14, "U")]), batch_id=100)
    assert _state(clone)["a"] == 999
    # the clone's first changes() window carries ONLY the clone's merge
    ch = {r["k"] for r in clone.changes(1).collect()}
    assert ch == {"a"}
    # crashed-clone retry: leftover dirs without a committed snapshot
    # must not block a re-clone
    stale = os.path.join(tmp_root, "half")
    os.makedirs(os.path.join(stale, "_meta"))
    os.makedirs(os.path.join(stale, "data"))
    clone2 = src.clone(stale)
    assert {r["k"] for r in clone2.read().collect()} == {r["k"] for r in src.read().collect()}


def test_source_maintenance_cannot_break_outstanding_shallow_clone(spark, tmp_root):
    """Round 4: clone() registers itself on the source
    (clone.outstanding.<uid>), and the source's vacuum counts every file a
    registered clone's retained snapshots reference as LIVE — so the
    maintenance trio (compact -> expire -> vacuum) no longer breaks a
    shallow clone (the caveat Delta leaves to the operator)."""
    src = LakeTable.create(
        spark, os.path.join(tmp_root, "msrc"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    src.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    clone = src.clone(os.path.join(tmp_root, "mdev"))
    assert list(src.clones().values()) == [os.path.abspath(os.path.join(tmp_root, "mdev"))]
    assert clone.snapshot()["properties"]["clone.source"] == src.root
    # source maintenance: rewrite everything, drop history, vacuum NOW
    src.merge(_src(spark, [("a", 10, 5, "U")]), batch_id=1)
    src.compact(include_clean=True)
    src.expire_snapshots(keep_last=1)
    removed = src.vacuum_orphans(min_age_sec=0)
    # the clone-referenced files survived; files referenced by NEITHER the
    # source's retained history NOR the clone may go
    assert _state(clone) == {"a": 1, "b": 2}
    assert _state(src) == {"a": 10, "b": 2}
    # registration survives while the clone still references source files
    assert src.clones()
    # sanity: vacuum did not throw and returns a count
    assert removed >= 0


def test_source_vacuum_deregisters_localized_and_deleted_clones(spark, tmp_root):
    import shutil as _shutil

    src = LakeTable.create(
        spark, os.path.join(tmp_root, "vsrc"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    src.merge(_src(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")]), batch_id=0)
    c1 = src.clone(os.path.join(tmp_root, "vdev1"))
    c2 = src.clone(os.path.join(tmp_root, "vdev2"))
    assert len(src.clones()) == 2
    # c1 localizes fully: compaction rewrites under its own root, then its
    # source-era snapshots expire
    c1.compact(include_clean=True)
    c1.expire_snapshots(keep_last=1)
    # c2 is deleted outright
    _shutil.rmtree(os.path.join(tmp_root, "vdev2"))
    # rewrite the source so the clone-era files leave its own history
    src.merge(_src(spark, [("a", 10, 5, "U")]), batch_id=1)
    src.compact(include_clean=True)
    src.expire_snapshots(keep_last=1)
    removed = src.vacuum_orphans(min_age_sec=0)
    assert removed > 0  # the old base files are reclaimable now
    assert src.clones() == {}  # both deregistered
    assert _state(c1) == {"a": 1, "b": 2}  # localized clone unaffected
    assert _state(src) == {"a": 10, "b": 2}


def test_clone_of_clone_registers_on_every_referenced_table(spark, tmp_root):
    """A clone of a clone references the ORIGINAL table's files by
    absolute path (they pass through the middle clone's metadata), so it
    must register on the original too — registering only on the direct
    source would let the original's vacuum break it once the middle
    clone localizes."""
    src = LakeTable.create(
        spark, os.path.join(tmp_root, "ccs"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    src.merge(_src(spark, [("a", 1, 1, "I")]), batch_id=0)
    c1 = src.clone(os.path.join(tmp_root, "cc1"))
    c1.merge(_src(spark, [("b", 2, 2, "I")]), batch_id=1)
    c2 = c1.clone(os.path.join(tmp_root, "cc2"))
    # c2 references src's files (via c1's pass-through) AND c1's own delta
    assert set(src.clones().values()) == {
        os.path.abspath(os.path.join(tmp_root, p)) for p in ("cc1", "cc2")
    }
    assert set(c1.clones().values()) == {os.path.abspath(os.path.join(tmp_root, "cc2"))}
    assert c2.clones() == {}  # registrations are not inherited
    assert _state(c2) == {"a": 1, "b": 2}
    # c1 localizes and expires; src maintenance must STILL protect c2
    c1.compact(include_clean=True)
    c1.expire_snapshots(keep_last=1)
    src.merge(_src(spark, [("a", 10, 5, "U")]), batch_id=1)
    src.compact(include_clean=True)
    src.expire_snapshots(keep_last=1)
    src.vacuum_orphans(min_age_sec=0)
    c1.vacuum_orphans(min_age_sec=0)
    assert _state(c2) == {"a": 1, "b": 2}  # survives both vacuums
    assert list(src.clones().values()) == [os.path.abspath(os.path.join(tmp_root, "cc2"))]
