"""Sketch operators: KMV distinct estimate and count-min frequency.

Both sketches are deterministic (md5-derived hashes), so the tests check
them BIT-FOR-BIT against a plain-Python reference implementation — the
same property the driver's DuckDB oracles rely on."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark.operators.sketches import (
    cms_build,
    cms_query,
    kmv_distinct,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _kmv_ref(values: list[str], k: int) -> tuple[int | None, int]:
    hs = sorted({_h32(v) for v in values})
    if len(hs) < k:
        return None, len(hs)
    kth = hs[k - 1]
    return kth, math.floor((k - 1) * 4294967296.0 / kth)


def test_kmv_matches_python_reference_bitwise(spark):
    rows = (
        [("big", f"u{i}") for i in range(3000)] * 2  # duplicates collapse
        + [("mid", f"m{i}") for i in range(200)]
        + [("small", f"s{i % 10}") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {
        r["grp"]: (r["kmv_kth"], r["distinct_est"])
        for r in kmv_distinct(df, "v", ["grp"], k=64, salt_buckets=8).collect()
    }
    for grp, vals in {
        "big": [f"u{i}" for i in range(3000)],
        "mid": [f"m{i}" for i in range(200)],
        "small": [f"s{i % 10}" for i in range(50)],
    }.items():
        assert got[grp] == _kmv_ref(vals, 64), grp
    # small group (< k distinct): exact count, no k-th hash
    assert got["small"] == (None, 10)
    # estimator accuracy on the big group: ~1/sqrt(64) relative error
    assert abs(got["big"][1] - 3000) / 3000 < 0.3


def test_kmv_salting_never_loses_bottom_k(spark):
    """The per-salt-cell bottom-k must be a superset of the global
    bottom-k for ANY salt_buckets — the k-th value is identical across
    salting configurations (and equals the unsalted truth)."""
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(500)], "grp string, v string"
    )
    kths = {
        s: kmv_distinct(df, "v", ["grp"], k=32, salt_buckets=s).collect()[0]["kmv_kth"]
        for s in (1, 4, 32)
    }
    truth, _ = _kmv_ref([f"x{i}" for i in range(500)], 32)
    assert set(kths.values()) == {truth}, kths


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark):
    freqs = {"alpha": 400, "beta": 80, "gamma": 8, "delta": 1}
    rows = [(v,) for v, n in freqs.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "v string")
    cms = cms_build(df, "v", depth=4, width=256)
    # cells per row sum to the total count; at most depth*width cells
    per_row = {
        r["row_id"]: r["s"]
        for r in cms.groupBy("row_id").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {i: sum(freqs.values()) for i in range(4)}
    est = {
        r["value"]: r["freq_est"]
        for r in cms_query(
            spark, cms, list(freqs) + ["absent"], depth=4, width=256
        ).collect()
    }
    for v, n in freqs.items():
        assert est[v] >= n  # CMS one-sided guarantee
        assert est[v] <= n + math.ceil(math.e / 256 * sum(freqs.values())) + 4
    assert est["absent"] >= 0  # absent key may collide but never negative


def test_cms_matches_python_reference_bitwise(spark):
    rows = [(f"k{i % 17}",) for i in range(300)]
    df = spark.createDataFrame(rows, "v string")
    got = {
        (r["row_id"], r["cell"]): r["cnt"]
        for r in cms_build(df, "v", depth=3, width=32).collect()
    }
    ref: dict[tuple[int, int], int] = {}
    for (v,) in rows:
        for d in range(3):
            cell = _h32(f"{d}|{v}") % 32
            ref[(d, cell)] = ref.get((d, cell), 0) + 1
    assert got == ref


def test_sketch_parameter_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", [], k=1)
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", [], k=8, salt_buckets=0)
    with pytest.raises(ValueError):
        cms_build(df, "v", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, "v", width=1)


def test_kmv_nulls_excluded_count_distinct_semantics(spark):
    """Review finding: md5(NULL) hashes to NULL, which sorts NULLS FIRST
    and used to occupy a bottom-k slot (shifting kmv_kth to the (k-1)-th
    real hash — systematic overestimate) and count as a distinct value in
    the small-group exact path. KMV must match COUNT(DISTINCT): nulls
    contribute nothing."""
    from french_admin_etl_spark.operators.sketches import kmv_distinct

    rows = [("g", str(i)) for i in range(40)] + [("g", None)] * 3
    df = spark.createDataFrame(rows, "grp string, v string")
    out = kmv_distinct(df, "v", ["grp"], k=64).collect()
    assert len(out) == 1
    r = out[0]
    # small group (< k distinct): exact path must equal COUNT(DISTINCT v)
    assert r["kmv_kth"] is None and r["distinct_est"] == 40

    # large group: the k-th hash must be the k-th REAL hash (same result
    # with and without null rows present)
    big = [("g", str(i)) for i in range(200)]
    with_nulls = spark.createDataFrame(big + [("g", None)] * 5, "grp string, v string")
    without = spark.createDataFrame(big, "grp string, v string")
    a = kmv_distinct(with_nulls, "v", ["grp"], k=64).collect()[0]
    b = kmv_distinct(without, "v", ["grp"], k=64).collect()[0]
    assert (a["kmv_kth"], a["distinct_est"]) == (b["kmv_kth"], b["distinct_est"])
