"""As-of join and range join operators (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from french_admin_etl_spark.operators.asof import asof_join, point_in_interval_join

STATES = [  # (key, seq, state)
    ("k1", 10, "a"),
    ("k1", 20, "b"),
    ("k1", 30, "c"),
    ("k2", 15, "x"),
]
EVENTS = [  # (key, seq)
    ("k1", 5),    # before any state -> null
    ("k1", 10),   # tie -> inclusive matches 'a', strict doesn't
    ("k1", 25),   # between -> 'b'
    ("k1", 99),   # after all -> 'c'
    ("k2", 20),   # -> 'x'
    ("k3", 50),   # key with no states -> null
]


def _frames(spark):
    left = spark.createDataFrame(EVENTS, ["key", "seq"])
    right = spark.createDataFrame(STATES, ["key", "sseq", "state"])
    return left, right


def test_asof_inclusive(spark):
    left, right = _frames(spark)
    out = {(r["key"], r["seq"]): r["state"]
           for r in asof_join(left, right, ["key"], "seq", "sseq").collect()}
    assert out == {
        ("k1", 5): None, ("k1", 10): "a", ("k1", 25): "b", ("k1", 99): "c",
        ("k2", 20): "x", ("k3", 50): None,
    }


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = {(r["key"], r["seq"]): r["state"]
           for r in asof_join(left, right, ["key"], "seq", "sseq", strict=True).collect()}
    assert out[("k1", 10)] is None  # tie excluded under strict <
    assert out[("k1", 25)] == "b"


def test_asof_multi_payload_and_left_columns_survive(spark):
    left = spark.createDataFrame([("k1", 25, "keepme")], ["key", "seq", "extra"])
    right = spark.createDataFrame(
        [("k1", 20, "b", 2.0)], ["key", "sseq", "state", "score"]
    )
    row = asof_join(left, right, ["key"], "seq", "sseq").first()
    assert row["extra"] == "keepme" and row["state"] == "b" and row["score"] == 2.0


def test_point_in_interval_join(spark):
    pts = spark.createDataFrame([(1, 3.0), (2, 7.5), (3, 11.0)], ["id", "v"])
    ivs = spark.createDataFrame(
        [(0.0, 5.0, "lo"), (4.0, 10.0, "mid"), (10.0, 12.0, "hi")],
        ["lo", "hi", "name"],
    )
    out = {(r["id"], r["name"]) for r in
           point_in_interval_join(pts, ivs, "v", "lo", "hi", bucket_width=4.0).collect()}
    assert out == {(1, "lo"), (2, "mid"), (3, "hi")}
    # boundary semantics: lo inclusive, hi exclusive
    edge = spark.createDataFrame([(9, 5.0), (10, 10.0)], ["id", "v"])
    out2 = {(r["id"], r["name"]) for r in
            point_in_interval_join(edge, ivs, "v", "lo", "hi", bucket_width=4.0).collect()}
    assert out2 == {(9, "mid"), (10, "hi")}


def test_range_join_is_equi_join_not_cross(spark):
    """The physical plan must join on the coarse bucket (equi), never
    BroadcastNestedLoop/cartesian."""
    import io
    from contextlib import redirect_stdout

    pts = spark.range(100).select(F.col("id"), (F.col("id") % 50.0).alias("v"))
    ivs = spark.range(10).select((F.col("id") * 5.0).alias("lo"), (F.col("id") * 5.0 + 5.0).alias("hi"))
    out = point_in_interval_join(pts, ivs, "v", "lo", "hi", bucket_width=5.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_exact_range_join_property_vs_naive(spark):
    """Property: the integer-quantized range join equals a naive
    theta-join filter on RANDOM intervals — negatives, zero-width,
    bucket-boundary-straddling, and width-1 cases all included — for
    several bucket widths. No epsilon anywhere."""
    import random

    from french_admin_etl_spark.operators.asof import point_in_interval_join_exact

    rnd = random.Random(97)
    pts = [(i, rnd.randint(-50, 50)) for i in range(120)]
    ivs = []
    for j in range(40):
        lo = rnd.randint(-50, 45)
        ivs.append((j, lo, lo + rnd.randint(0, 12)))  # hi-exclusive, may be empty
    pdf = spark.createDataFrame(pts, "pid int, v long")
    idf = spark.createDataFrame(ivs, "iid int, lo long, hi long")
    naive = {
        (p, i) for p, v in pts for i, lo, hi in ivs if lo <= v < hi
    }
    for width in (1, 3, 7, 64):
        got = {
            (r["pid"], r["iid"])
            for r in point_in_interval_join_exact(
                pdf, idf, "v", "lo", "hi", bucket_width=width
            ).collect()
        }
        assert got == naive, f"width={width}"


def test_exact_range_join_boundary_no_epsilon_leak(spark):
    """hi lands exactly on a bucket boundary: the interval must NOT probe
    the bucket starting at hi (the case the float epsilon guarded)."""
    from french_admin_etl_spark.operators.asof import point_in_interval_join_exact

    pts = spark.createDataFrame([(1, 10), (2, 9)], "pid int, v long")
    ivs = spark.createDataFrame([(0, 5, 10)], "iid int, lo long, hi long")
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join_exact(
            pts, ivs, "v", "lo", "hi", bucket_width=5
        ).collect()
    }
    assert got == {(2, 0)}  # 10 excluded (hi-exclusive), 9 included


def test_degenerate_intervals_dropped_not_exploded(spark):
    """Review finding: an interval with hi <= lo (swapped/corrupt bounds)
    made F.sequence generate a DESCENDING bucket list — one bad row
    exploding into O(|hi-lo|/width) spurious rows. Empty intervals match
    nothing by definition and must simply be dropped."""
    from french_admin_etl_spark.operators.asof import (
        point_in_interval_join,
        point_in_interval_join_exact,
    )

    pts = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 1e9, 0.0), (12, 5.0, 5.0)],
        "iid long, lo double, hi double",
    )
    got = point_in_interval_join(pts, iv, "x", "lo", "hi", bucket_width=5.0).collect()
    assert [r["iid"] for r in got] == [10]

    pts_i = spark.createDataFrame([(1, 5)], "pid long, x long")
    iv_i = spark.createDataFrame(
        [(10, 0, 10), (11, 10**9, 0), (12, 5, 5)], "iid long, lo long, hi long"
    )
    got_i = point_in_interval_join_exact(
        pts_i, iv_i, "x", "lo", "hi", bucket_width=5
    ).collect()
    assert [r["iid"] for r in got_i] == [10]


def test_range_join_left_outer_keeps_unmatched_points(spark):
    """Review finding: the range predicate must ride INSIDE the join
    condition — a post-join filter drops the null-extended rows and
    how='left' silently degrades to inner. A point inside no interval
    must survive as exactly ONE null row; matched points must not
    duplicate across an interval's exploded buckets."""
    import pytest as _pytest

    from french_admin_etl_spark.operators.asof import (
        point_in_interval_join,
        point_in_interval_join_exact,
    )

    pts = spark.createDataFrame(
        [(1, 7.0), (2, 93.0), (3, 12.0)], "pid long, x double"
    )
    iv = spark.createDataFrame(
        # iid 20 spans buckets 0..3 at width 5 — still ONE match for pid 1/3
        [(20, 0.0, 16.0), (21, 11.0, 13.0)], "iid long, lo double, hi double"
    )
    got = point_in_interval_join(
        pts, iv, "x", "lo", "hi", bucket_width=5.0, how="left"
    ).collect()
    by_pid = {}
    for r in got:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    assert sorted(by_pid[1]) == [20]
    assert by_pid[2] == [None]  # unmatched point survives, null-extended
    assert sorted(by_pid[3]) == [20, 21]
    assert len(got) == 4

    pts_i = spark.createDataFrame([(1, 7), (2, 93)], "pid long, x long")
    iv_i = spark.createDataFrame([(20, 0, 16)], "iid long, lo long, hi long")
    got_i = point_in_interval_join_exact(
        pts_i, iv_i, "x", "lo", "hi", bucket_width=5, how="left"
    ).collect()
    assert {(r["pid"], r["iid"]) for r in got_i} == {(1, 20), (2, None)}

    with _pytest.raises(ValueError, match="how="):
        point_in_interval_join(pts, iv, "x", "lo", "hi", 5.0, how="full")
    with _pytest.raises(ValueError, match="how="):
        point_in_interval_join_exact(pts_i, iv_i, "x", "lo", "hi", 5, how="right")
