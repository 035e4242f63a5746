"""SecondaryIndex: CDC-maintained value→keys index over non-key columns."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.secondary_index import SecondaryIndex
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, repo string, path string, lang string, content string"
    )


@pytest.fixture()
def rig(spark, tmp_root):
    source = LakeTable.create(
        spark, tmp_root + "/src", SCHEMA, ["repo", "path"],
        num_buckets=4, write_mode="mor",
    )
    source.merge(
        _src(spark, [
            (1, "I", "a", "f1", "go", "g1"),
            (2, "I", "a", "f2", "py", "p1"),
            (3, "I", "b", "f3", "go", "g2"),
            (4, "I", "b", "f4", "rs", "r1"),
        ]),
        batch_id=0,
    )
    idx = SecondaryIndex.create(spark, source, tmp_root + "/idx", ["lang"])
    ckpt = CheckpointStore(os.path.join(tmp_root, "idx.ck"))
    return source, idx, ckpt


def _index_state(idx):
    return {(r["repo"], r["path"]): r["lang"] for r in idx.table.read().collect()}


def test_bootstrap_then_search(spark, rig):
    source, idx, ckpt = rig
    idx.sync(ckpt)
    assert _index_state(idx) == {
        ("a", "f1"): "go", ("a", "f2"): "py", ("b", "f3"): "go", ("b", "f4"): "rs",
    }
    hits = {(r["repo"], r["path"]) for r in idx.search(lang="go").collect()}
    assert hits == {("a", "f1"), ("b", "f3")}


def test_update_is_self_cleaning(spark, rig):
    """A value change must MOVE the posting, never strand it under the
    old value — the property the source-keyed design buys."""
    source, idx, ckpt = rig
    idx.sync(ckpt)
    source.merge(_src(spark, [(10, "U", "a", "f1", "py", "g1b")]), batch_id=1)
    idx.sync(ckpt)
    assert {(r["repo"], r["path"]) for r in idx.search(lang="go").collect()} == {("b", "f3")}
    assert {(r["repo"], r["path"]) for r in idx.search(lang="py").collect()} == {
        ("a", "f1"), ("a", "f2"),
    }


def test_delete_removes_posting(spark, rig):
    source, idx, ckpt = rig
    idx.sync(ckpt)
    source.merge(_src(spark, [(10, "D", "b", "f3", None, None)]), batch_id=1)
    idx.sync(ckpt)
    assert {(r["repo"], r["path"]) for r in idx.search(lang="go").collect()} == {("a", "f1")}


def test_rows_returns_full_source_rows(spark, rig):
    source, idx, ckpt = rig
    idx.sync(ckpt)
    got = {(r["repo"], r["path"]): r["content"] for r in idx.rows(lang="go").collect()}
    assert got == {("a", "f1"): "g1", ("b", "f3"): "g2"}
    assert set(idx.rows(lang="go").columns) == {"repo", "path", "lang", "content"}


def test_incremental_sync_is_exactly_once(spark, rig):
    """Replaying the same window (fresh cascade over the same checkpoint
    state) must fence to a no-op, and the index must equal a from-scratch
    rebuild after arbitrary update/delete traffic."""
    source, idx, ckpt = rig
    idx.sync(ckpt)
    source.merge(
        _src(spark, [
            (10, "U", "a", "f2", "go", "p2"),
            (11, "D", "b", "f4", None, None),
            (12, "I", "c", "f5", "py", "c1"),
        ]),
        batch_id=1,
    )
    res = idx.sync(ckpt)
    assert any(r.mode == "incremental" for r in res)
    v = idx.table.current_version()
    again = idx.sync(ckpt)
    assert all(r.mode == "noop" for r in again) and idx.table.current_version() == v
    # maintained index == declarative projection of the live source
    truth = {
        (r["repo"], r["path"]): r["lang"]
        for r in source.read().select("repo", "path", "lang").collect()
    }
    assert _index_state(idx) == truth


def test_optimize_clusters_by_value(spark, rig):
    """After optimize(), each index file's lang min==max (value-clustered
    layout) wherever a file holds one lang — the row-group-pruning shape.
    Weaker cross-file assert: search results unchanged."""
    source, idx, ckpt = rig
    idx.sync(ckpt)
    before = {tuple(sorted(r.asDict().items())) for r in idx.search(lang="go").collect()}
    idx.optimize()
    after = {tuple(sorted(r.asDict().items())) for r in idx.search(lang="go").collect()}
    assert before == after
    snap = idx.table.snapshot()
    assert all(g.get("sorted_by") == ["lang"] for g in snap["file_groups"])


def test_create_rejects_key_and_unknown_columns(spark, rig):
    source, idx, ckpt = rig
    with pytest.raises(ValueError, match="key columns"):
        SecondaryIndex.create(spark, source, "/tmp/nope1", ["repo"])
    with pytest.raises(ValueError, match="no column"):
        SecondaryIndex.create(spark, source, "/tmp/nope2", ["nope"])
    with pytest.raises(ValueError, match="not in indexed"):
        idx.search(content="x")


def test_delete_where_flows_into_index(spark, rig):
    """Predicate deletes on the source surface in changes() and therefore
    must cascade into the index like any CDC delete."""
    source, idx, ckpt = rig
    idx.sync(ckpt)
    source.delete_where("lang = 'go'", batch_id=1)
    idx.sync(ckpt)
    assert idx.search(lang="go").collect() == []
    assert set(_index_state(idx).values()) == {"py", "rs"}


def test_rows_scans_only_hit_buckets(spark, rig):
    """rows() must read only the source buckets that can hold a hit —
    pinned via the planned scan's inputFiles (review finding: the first
    cut resolved the whole source per query)."""
    import re

    from french_admin_etl_spark.table.lake_table import _bucket_expr

    source, idx, ckpt = rig
    idx.sync(ckpt)
    snap = source.snapshot()
    hit_buckets = {
        r["_b"]
        for r in idx.search(lang="rs")
        .select(_bucket_expr(snap["key_cols"], snap["num_buckets"]).alias("_b"))
        .distinct()
        .collect()
    }
    df = idx.rows(lang="rs")
    got = {(r["repo"], r["path"]): r["content"] for r in df.collect()}
    assert got == {("b", "f4"): "r1"}
    src_files = [f for f in df.inputFiles() if "/src/" in f]
    assert src_files, "source side should scan parquet files"
    scanned_buckets = {int(re.search(r"-b(\d+)-", f).group(1)) for f in src_files}
    assert scanned_buckets <= hit_buckets
    assert len(scanned_buckets) < snap["num_buckets"]  # genuinely pruned


def test_index_accelerated_delete(spark, rig):
    """delete_where(keys_df=idx.search(...)) erases by index hit set —
    no full predicate scan of the source; same final state as the
    predicate form; fenced like any delete batch."""
    source, idx, ckpt = rig
    idx.sync(ckpt)
    stats = source.delete_where(keys_df=idx.search(lang="go"), batch_id=1)
    assert stats.rows_deleted == 2
    assert {r["path"] for r in source.read().collect()} == {"f2", "f4"}
    # replay fences
    again = source.delete_where(keys_df=idx.search(lang="go"), batch_id=1)
    assert again.fenced
    # exactly one of condition/keys_df
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exactly one"):
        source.delete_where("lang = 'py'", keys_df=idx.search(lang="py"))
    with _pytest.raises(ValueError, match="exactly one"):
        source.delete_where()
    with _pytest.raises(ValueError, match="lacks key"):
        source.delete_where(keys_df=idx.search(lang="py").select("repo"))


def test_search_in_null_safe(spark, tmp_root):
    """search_in matches NULL probe values against IS NULL rows — the
    same eqNullSafe semantics as search()."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
    from french_admin_etl_spark.table.lake_table import LakeTable

    src = LakeTable.create(
        spark, os.path.join(tmp_root, "src"),
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("fk", T.StringType())]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    src.merge(
        spark.createDataFrame(
            [(1, "I", 1, "a"), (2, "I", 2, None), (3, "I", 3, "b")],
            "lsn long, op string, id long, fk string",
        ),
        batch_id=0,
    )
    idx = SecondaryIndex.create(spark, src, os.path.join(tmp_root, "idx"), ["fk"])
    idx.sync(CheckpointStore(os.path.join(tmp_root, "ck.json")))
    probe = spark.createDataFrame([("a",), (None,)], "fk string")
    got = sorted(r["id"] for r in idx.search_in("fk", probe).collect())
    assert got == [1, 2]
    assert sorted(r["id"] for r in idx.search(fk=None).collect()) == [2]


def test_search_in_rejects_ambiguous_probe_frame(spark, tmp_root):
    """A multi-column probe frame without an explicit probe_col raises
    instead of silently probing columns[0] (review finding: a wide frame
    got wrong-column matches with no error); probe_col= selects the
    intended column."""
    src = LakeTable.create(
        spark, os.path.join(tmp_root, "src"),
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("fk", T.StringType())]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    src.merge(
        spark.createDataFrame(
            [(1, "I", 1, "a"), (2, "I", 2, "b")],
            "lsn long, op string, id long, fk string",
        ),
        batch_id=0,
    )
    idx = SecondaryIndex.create(spark, src, os.path.join(tmp_root, "idx"), ["fk"])
    idx.sync(CheckpointStore(os.path.join(tmp_root, "ck.json")))
    wide = spark.createDataFrame([("junk", "a")], "noise string, val string")
    with pytest.raises(ValueError, match="pass probe_col"):
        idx.search_in("fk", wide)
    with pytest.raises(ValueError, match="not in"):
        idx.search_in("fk", wide, probe_col="missing")
    got = [r["id"] for r in idx.search_in("fk", wide, probe_col="val").collect()]
    assert got == [1]
