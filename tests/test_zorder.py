"""Z-order (Morton curve) file layout: optimize_zorder.

The proof obligation: after z-ordering on (x, y), range scans prune
files on BOTH dimensions, where the lexicographic layout prunes only on
the leading one. Plus state preservation, delta folding, and validation.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.table.lake_table import LakeTable

N = 4096
FILES_PER = 16  # max-records-per-file 256 → 16 files in the single bucket


@pytest.fixture()
def ztable(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "z"),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
        ]),
        ["id"], num_buckets=1, write_mode="mor",
        properties={"write.max-records-per-file": N // FILES_PER},
    )
    # x and y are independent uniform permutations of 0..N-1 (bit-reversal
    # makes y decorrelated from x deterministically, no RNG)
    rows = spark.range(N).select(
        F.col("id"),
        F.col("id").alias("x"),
        F.lit(None).cast("long").alias("y"),
    )
    rev = 12  # N = 2^12

    def bitrev(c):
        parts = [
            F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long"), rev - 1 - i)
            for i in range(rev)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    src = rows.select(
        "id", "x", bitrev(F.col("id")).alias("y"),
        (F.col("id") + 1).alias("lsn"), F.lit("I").alias("op"),
    )
    t.merge(src, batch_id=0)
    return t


def _scanned(t, col, lo, hi):
    return len(t.scan_range(col, lo, hi).inputFiles())


def _total_files(t):
    return sum(len(g["files"]) for g in t.snapshot()["file_groups"])


def test_zorder_prunes_both_dimensions_lex_only_leading(spark, ztable):
    t = ztable
    lo, hi = 0, N // 8 - 1  # a 1/8-of-domain range on each dimension

    # lexicographic baseline: x prunes, y cannot (every file spans all y)
    t.optimize_sort(["x", "y"])
    assert _total_files(t) == FILES_PER
    lex_x, lex_y = _scanned(t, "x", lo, hi), _scanned(t, "y", lo, hi)
    assert lex_x <= FILES_PER // 4  # leading column: tight
    assert lex_y == FILES_PER       # second column: no pruning at all

    truth_x = {r["id"] for r in t.read().filter(F.col("x").between(lo, hi)).collect()}
    truth_y = {r["id"] for r in t.read().filter(F.col("y").between(lo, hi)).collect()}

    t.optimize_zorder(["x", "y"])
    assert _total_files(t) == FILES_PER
    z_x, z_y = _scanned(t, "x", lo, hi), _scanned(t, "y", lo, hi)
    assert z_x < FILES_PER and z_y < FILES_PER       # both dimensions prune
    assert z_y <= FILES_PER // 2                     # and meaningfully so
    # correctness: pruned scans return exactly the truth
    assert {r["id"] for r in t.scan_range("x", lo, hi).collect()} == truth_x
    assert {r["id"] for r in t.scan_range("y", lo, hi).collect()} == truth_y


def test_zorder_preserves_state_and_folds_deltas(spark, ztable):
    t = ztable
    t.merge(
        spark.createDataFrame(
            [(7, 9999, 9999, 10_000, "U"), (8, None, None, 10_001, "D")],
            "id long, x long, y long, lsn long, op string",
        ),
        batch_id=1,
    )
    before = {r["id"]: (r["x"], r["y"]) for r in t.read().collect()}
    assert before[7] == (9999, 9999) and 8 not in before
    t.optimize_zorder(["x", "y"])
    snap = t.snapshot()
    assert not any(g.get("delta") for g in snap["file_groups"])  # folded
    assert all(g.get("zorder") == ["x", "y"] for g in snap["file_groups"])
    assert {r["id"]: (r["x"], r["y"]) for r in t.read().collect()} == before
    # the late-event shadow survives the rewrite: id 8's tombstone still
    # blocks an out-of-order event below its LSN
    t.merge(
        spark.createDataFrame(
            [(8, 1, 1, 5_000, "U")], "id long, x long, y long, lsn long, op string"
        ),
        batch_id=2,
    )
    assert 8 not in {r["id"] for r in t.read().collect()}


def test_zorder_validation(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "zv"),
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ]),
        ["k"], num_buckets=1,
    )
    with pytest.raises(ValueError, match="2-4 columns"):
        t.optimize_zorder(["a"])
    with pytest.raises(ValueError, match="no column"):
        t.optimize_zorder(["a", "nope"])
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        t.optimize_zorder(["a", "k"])
    with pytest.raises(ValueError, match="bits"):
        t.optimize_zorder(["a", "b"], bits=0)
    # empty table: a no-op rewrite commits cleanly
    v = t.optimize_zorder(["a", "b"])
    assert t.snapshot()["version"] == v and t.read().count() == 0


def test_zorder_on_timestamp_column(spark, tmp_root):
    """Date/timestamp columns rank through their epoch cast — state
    preserved and the layout recorded."""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "zt"),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]),
        ["id"], num_buckets=1, write_mode="mor",
    )
    t.merge(
        spark.range(100).selectExpr(
            "id",
            "timestamp_seconds(1700000000 + id * 3600) AS ts",
            "(id * 37) % 100 AS n",
            "id + 1 AS lsn",
            "'I' AS op",
        ),
        batch_id=0,
    )
    before = {r["id"]: (r["ts"], r["n"]) for r in t.read().collect()}
    t.optimize_zorder(["ts", "n"])
    assert all(g.get("zorder") == ["ts", "n"] for g in t.snapshot()["file_groups"])
    assert {r["id"]: (r["ts"], r["n"]) for r in t.read().collect()} == before
