"""Incrementally-maintained join views (streaming/joinview.py).

Every test compares the maintained view against the DECLARATIVE truth —
the same left join recomputed from scratch over the sources' current
live rows — after each sync, so the incremental path can never drift
from the semantics it claims to maintain.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.streaming.joinview import JoinView
from french_admin_etl_spark.table.lake_table import LakeTable

COMMUNE = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("dep_code", T.StringType()),
        T.StructField("pop", T.LongType()),
    ]
)
DEP = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("dep_name", T.StringType()),
        T.StructField("region_code", T.StringType()),
    ]
)


def _mk_tables(spark, root):
    com = LakeTable.create(
        spark, os.path.join(root, "commune"), COMMUNE, ["code"], num_buckets=4,
        write_mode="mor",
    )
    dep = LakeTable.create(
        spark, os.path.join(root, "dep"), DEP, ["code"], num_buckets=2,
        write_mode="mor",
    )
    return com, dep


def _com_src(spark, rows):
    return spark.createDataFrame(
        rows, "code string, name string, dep_code string, pop long, lsn long, op string"
    )


def _dep_src(spark, rows):
    return spark.createDataFrame(
        rows, "code string, dep_name string, region_code string, lsn long, op string"
    )


def _truth(com, dep, select):
    """Declarative recompute: left join over current live rows."""
    r = dep.read().select(
        F.col("code").alias("_rc"),
        *[F.col(src).alias(out) for out, src in select.items()],
    )
    return {
        tuple(sorted(row.asDict().items()))
        for row in com.read()
        .join(r, on=F.col("dep_code") == F.col("_rc"), how="left")
        .drop("_rc")
        .collect()
    }


def _got(jv):
    return {tuple(sorted(r.asDict().items())) for r in jv.read().collect()}


SELECT = {"dep_name": "dep_name", "region_code": "region_code"}


@pytest.fixture()
def setup(spark, tmp_root):
    com, dep = _mk_tables(spark, tmp_root)
    dep.merge(
        _dep_src(
            spark,
            [("d1", "Ain", "r1", 1, "I"), ("d2", "Aisne", "r1", 2, "I"), ("d3", "Allier", "r2", 3, "I")],
        ),
        batch_id=0,
    )
    com.merge(
        _com_src(
            spark,
            [
                ("c1", "Amiens", "d2", 100, 1, "I"),
                ("c2", "Bourg", "d1", 200, 2, "I"),
                ("c3", "Lost", "d9", 300, 3, "I"),  # dangling fk → nulls
                ("c4", "Nofk", None, 400, 4, "I"),  # null fk → nulls
            ],
        ),
        batch_id=0,
    )
    jv = JoinView.create(
        spark, com, dep, os.path.join(tmp_root, "view"), on=[("dep_code", "code")],
        select=SELECT,
    )
    return com, dep, jv


def test_bootstrap_matches_declarative_join(spark, setup):
    com, dep, jv = setup
    r = jv.sync()
    assert r["mode"] == "bootstrap"
    assert _got(jv) == _truth(com, dep, SELECT)
    assert jv.sync()["mode"] == "noop"


def test_left_deltas_insert_update_delete_fkmove(spark, setup):
    com, dep, jv = setup
    jv.sync()
    com.merge(
        _com_src(
            spark,
            [
                ("c5", "New", "d3", 500, 10, "I"),     # insert
                ("c1", "Amiens", "d2", 150, 11, "U"),  # attr update
                ("c2", "Bourg", "d3", 200, 12, "U"),   # fk moves d1→d3
                ("c3", None, None, None, 13, "D"),     # delete
            ],
        ),
        batch_id=1,
    )
    r = jv.sync()
    assert r["mode"] == "incremental" and r["deletes"] == 1
    assert _got(jv) == _truth(com, dep, SELECT)


def test_right_deltas_fan_out(spark, setup):
    com, dep, jv = setup
    jv.sync()
    dep.merge(
        _dep_src(
            spark,
            [
                ("d1", "Ain-renamed", "r9", 10, "U"),  # attr update fans out to c2
                ("d2", None, None, 11, "D"),           # delete → c1 nulls out
                ("d9", "Late dim", "r3", 12, "I"),     # c3's dangling fk heals
            ],
        ),
        batch_id=1,
    )
    r = jv.sync()
    assert r["mode"] == "incremental"
    truth = _truth(com, dep, SELECT)
    assert _got(jv) == truth
    byk = {dict(t)["code"]: dict(t) for t in truth}
    assert byk["c2"]["dep_name"] == "Ain-renamed"
    assert byk["c1"]["dep_name"] is None
    assert byk["c3"]["dep_name"] == "Late dim"


def test_both_sides_change_one_window(spark, setup):
    com, dep, jv = setup
    jv.sync()
    com.merge(_com_src(spark, [("c1", "Amiens", "d3", 101, 20, "U")]), batch_id=1)
    dep.merge(_dep_src(spark, [("d3", "Allier-2", "r2", 21, "U")]), batch_id=1)
    r = jv.sync()
    assert r["mode"] == "incremental"
    assert _got(jv) == _truth(com, dep, SELECT)


def test_replay_fences_and_reconverges(spark, setup):
    """Crash between merge-commit and nothing (markers ride the commit):
    rewinding the markers and re-syncing must fence to a no-op with
    identical state — the exactly-once contract."""
    com, dep, jv = setup
    jv.sync()
    com.merge(_com_src(spark, [("c1", "Amiens", "d1", 111, 30, "U")]), batch_id=1)
    before_l, before_r = jv.synced_versions()
    jv.sync()
    state = _got(jv)
    # simulate the crash: markers back to the pre-sync values
    snap = jv.view.snapshot()
    new = dict(snap)
    props = dict(snap["properties"])
    props[jv._synced_l], props[jv._synced_r] = before_l, before_r
    new.update(version=snap["version"] + 1, properties=props, parent=snap["version"])
    jv.view._commit(new)
    r = jv.sync()
    assert r.get("fenced") is True
    assert _got(jv) == state


def test_folded_window_falls_back_to_resync(spark, setup):
    com, dep, jv = setup
    jv.sync()
    com.merge(_com_src(spark, [("c6", "Sixth", "d1", 40, 40, "I")]), batch_id=1)
    com.compact(include_clean=True)  # folds the window's deltas away
    r = jv.sync()
    assert r["mode"] == "resync"
    assert _got(jv) == _truth(com, dep, SELECT)
    # and incremental service resumes after the resync
    com.merge(_com_src(spark, [("c6", "Sixth", "d2", 41, 41, "U")]), batch_id=2)
    assert jv.sync()["mode"] == "incremental"
    assert _got(jv) == _truth(com, dep, SELECT)


def test_chained_views_three_level_hierarchy(spark, tmp_root):
    """The reference's COG hierarchy as two maintained hops:
    commune⟕department, then (that view)⟕region — a change at ANY level
    flows through both hops incrementally."""
    com, dep = _mk_tables(spark, tmp_root)
    REGION = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("region_name", T.StringType())]
    )
    reg = LakeTable.create(
        spark, os.path.join(tmp_root, "region"), REGION, ["code"], num_buckets=2,
        write_mode="mor",
    )
    reg.merge(
        spark.createDataFrame(
            [("r1", "Nord", 1, "I"), ("r2", "Sud", 2, "I")],
            "code string, region_name string, lsn long, op string",
        ),
        batch_id=0,
    )
    dep.merge(
        _dep_src(spark, [("d1", "Ain", "r1", 1, "I"), ("d2", "Aisne", "r2", 2, "I")]),
        batch_id=0,
    )
    com.merge(
        _com_src(spark, [("c1", "A", "d1", 10, 1, "I"), ("c2", "B", "d2", 20, 2, "I")]),
        batch_id=0,
    )
    hop1 = JoinView.create(
        spark, com, dep, os.path.join(tmp_root, "v1"), on=[("dep_code", "code")],
        select=SELECT, writer_id="hop1",
    )
    hop1.sync()
    hop2 = JoinView.create(
        spark, hop1.view, reg, os.path.join(tmp_root, "v2"),
        on=[("region_code", "code")], select={"region_name": "region_name"},
        writer_id="hop2",
    )
    hop2.sync()

    def truth2():
        r = reg.read().select(F.col("code").alias("_rc"), "region_name")
        return {
            tuple(sorted(row.asDict().items()))
            for row in hop1.view.read()
            .join(r, on=F.col("region_code") == F.col("_rc"), how="left")
            .drop("_rc")
            .collect()
        }

    assert {tuple(sorted(r.asDict().items())) for r in hop2.read().collect()} == truth2()

    # a REGION rename reaches communes through both hops
    reg.merge(
        spark.createDataFrame(
            [("r1", "Nord-Est", 5, "U")], "code string, region_name string, lsn long, op string"
        ),
        batch_id=1,
    )
    # a commune insert reaches hop2 through hop1's changes()
    com.merge(_com_src(spark, [("c3", "C", "d1", 30, 6, "I")]), batch_id=1)
    assert hop1.sync()["mode"] == "incremental"
    r2 = hop2.sync()
    assert r2["mode"] == "incremental"
    got = {tuple(sorted(r.asDict().items())) for r in hop2.read().collect()}
    assert got == truth2()
    byk = {dict(t)["code"]: dict(t) for t in got}
    assert byk["c1"]["region_name"] == "Nord-Est"
    assert byk["c3"]["region_name"] == "Nord-Est"


def test_fk_index_probe_path(spark, tmp_root):
    """With a SecondaryIndex on the fk, the dimension fan-out probe reads
    the narrow index table instead of scanning the left table — state
    must be identical to the scan path."""
    from french_admin_etl_spark.operators.secondary_index import SecondaryIndex
    from french_admin_etl_spark.streaming.checkpoint import CheckpointStore

    com, dep = _mk_tables(spark, tmp_root)
    dep.merge(_dep_src(spark, [("d1", "Ain", "r1", 1, "I"), ("d2", "Aisne", "r1", 2, "I")]), batch_id=0)
    com.merge(
        _com_src(
            spark,
            [("c%d" % i, "n%d" % i, "d1" if i % 2 else "d2", i, i + 1, "I") for i in range(10)],
        ),
        batch_id=0,
    )
    idx = SecondaryIndex.create(spark, com, os.path.join(tmp_root, "idx"), ["dep_code"])
    ck = CheckpointStore(os.path.join(tmp_root, "idx_ck.json"))
    idx.sync(ck)
    jv = JoinView.create(
        spark, com, dep, os.path.join(tmp_root, "view"), on=[("dep_code", "code")],
        select=SELECT, fk_index=idx,
    )
    jv.sync()
    dep.merge(_dep_src(spark, [("d1", "Ain-2", "r1", 9, "U")]), batch_id=1)
    idx.sync(ck)  # the documented contract: index synced before the view
    r = jv.sync()
    assert r["mode"] == "incremental"
    assert _got(jv) == _truth(com, dep, SELECT)

    # validation: an index on the wrong columns is rejected up front
    idx2 = SecondaryIndex.create(spark, com, os.path.join(tmp_root, "idx2"), ["name"])
    with pytest.raises(ValueError, match="fk_index covers"):
        JoinView(
            spark, com, dep, jv.view, on=[("dep_code", "code")], select=SELECT,
            fk_index=idx2,
        )


def test_create_validation(spark, tmp_root):
    com, dep = _mk_tables(spark, tmp_root)
    with pytest.raises(ValueError, match="cover the right key"):
        JoinView.create(
            spark, com, dep, os.path.join(tmp_root, "v"), on=[("dep_code", "dep_name")],
            select=SELECT,
        )
    with pytest.raises(ValueError, match="collides"):
        JoinView.create(
            spark, com, dep, os.path.join(tmp_root, "v"), on=[("dep_code", "code")],
            select={"name": "dep_name"},
        )
    with pytest.raises(ValueError, match="does not exist"):
        JoinView.create(
            spark, com, dep, os.path.join(tmp_root, "v"), on=[("dep_code", "code")],
            select={"x": "nope"},
        )


def test_composition_aggview_over_joinview(spark, tmp_root):
    """Maintained-view COMPOSITION: an AggregateView rolls up the OUTPUT
    of a JoinView (population per region label), and a single upstream
    change — a commune moving departments — flows through BOTH hops
    incrementally: join recompute O(changed keys), then rollup retract +
    insert O(changed groups). The enriched-rollup pipeline every
    dimension model needs, maintained end-to-end."""
    from french_admin_etl_spark.streaming.aggview import AggregateView

    com, dep = _mk_tables(spark, tmp_root)
    dep.merge(
        _dep_src(spark, [("d1", "Ain", "NORD", 1, "I"), ("d2", "Aisne", "SUD", 2, "I")]),
        batch_id=0,
    )
    com.merge(
        _com_src(
            spark,
            [
                ("c1", "A", "d1", 100, 1, "I"),
                ("c2", "B", "d1", 200, 2, "I"),
                ("c3", "C", "d2", 50, 3, "I"),
            ],
        ),
        batch_id=0,
    )
    jv = JoinView.create(
        spark, com, dep, os.path.join(tmp_root, "enriched"),
        on=[("dep_code", "code")], select={"region": "region_code"},
    )
    jv.sync()
    av = AggregateView.create(
        spark, jv.view, os.path.join(tmp_root, "rollup"),
        group_cols=["region"], sums={"pop_sum": "pop"},
    )
    av.sync()

    def rollup():
        return {r["region"]: (r["cnt"], r["pop_sum"]) for r in av.read().collect()}

    assert rollup() == {"NORD": (2, 300), "SUD": (1, 50)}

    # ONE upstream event: c2 moves d1→d2 (NORD loses 200, SUD gains 200)
    com.merge(_com_src(spark, [("c2", "B", "d2", 200, 10, "U")]), batch_id=1)
    assert jv.sync()["mode"] == "incremental"
    r = av.sync()
    assert r["mode"] == "incremental"  # the rollup hop stayed incremental too
    assert rollup() == {"NORD": (1, 100), "SUD": (2, 250)}

    # a delete retracts through both hops
    com.merge(_com_src(spark, [("c3", None, None, None, 11, "D")]), batch_id=2)
    jv.sync()
    av.sync()
    assert rollup() == {"NORD": (1, 100), "SUD": (1, 200)}


def test_mark_synced_never_regresses_markers(spark, tmp_root):
    """Review finding: the empty-window marker advance wrote BOTH markers
    unconditionally once either was behind — a racing sync that had read
    one side further ahead was REGRESSED to a mixed state matching no
    actual sync."""
    import os

    from french_admin_etl_spark.table.lake_table import LakeTable

    left = LakeTable.create(
        spark, os.path.join(tmp_root, "ml"), 
        T.StructType([T.StructField("id", T.LongType()), T.StructField("fk", T.StringType())]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    right = LakeTable.create(
        spark, os.path.join(tmp_root, "mr"),
        T.StructType([T.StructField("code", T.StringType()), T.StructField("label", T.StringType())]),
        ["code"], num_buckets=2, write_mode="mor",
    )
    jv = JoinView.create(
        spark, left, right, os.path.join(tmp_root, "mv"),
        on=[("fk", "code")], select={"label": "label"},
    )
    # simulate the racing sync having advanced left to 6 / right to 2
    jv.view.update_properties(
        lambda p: {**p, jv._synced_l: 6, jv._synced_r: 2}
    )
    jv._mark_synced(5, 3, "empty")  # this sync read (5, 3)
    assert jv.synced_versions() == (6, 3)  # per-marker max, no regression
    # fully-behind call is a pure no-op
    jv._mark_synced(4, 1, "empty")
    assert jv.synced_versions() == (6, 3)
