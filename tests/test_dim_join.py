"""J1 (existence-probe + null-out) and J2 (FK anti-join) operators.

Mirrors the rigor of the reference's filter tests
(``CsvRecordFilter_test.go``): hit, miss, null-FK, duplicate dimension
keys, plan shape (broadcast, no shuffle of the fact side).
"""

import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark.operators.dim_join import assert_fk, fk_orphans, fk_validate


@pytest.fixture()
def frames(spark):
    fact = spark.createDataFrame(
        [(1, "epci_a", "x"), (2, "epci_b", "y"), (3, "epci_MISSING", "z"),
         (4, None, "w")],
        "id int, epci_key string, payload string",
    )
    dim = spark.createDataFrame(
        [("epci_a", "A"), ("epci_b", "B"), ("epci_b", "B-dup")],
        "key string, name string",
    )
    return fact, dim


def test_fk_validate_nulls_out_misses_keeps_hits(spark, frames):
    fact, dim = frames
    out = fk_validate(fact, dim, "epci_key", "key")
    got = {r["id"]: r["epci_key"] for r in out.collect()}
    assert got == {1: "epci_a", 2: "epci_b", 3: None, 4: None}
    # column set and order unchanged; other columns untouched
    assert out.columns == fact.columns
    assert {r["id"]: r["payload"] for r in out.collect()} == {
        1: "x", 2: "y", 3: "z", 4: "w"
    }


def test_fk_validate_duplicate_dim_keys_do_not_fan_out(spark, frames):
    fact, dim = frames
    out = fk_validate(fact, dim, "epci_key", "key")
    assert out.count() == fact.count()  # probe is distinct: no row duplication


def test_fk_validate_broadcasts_no_fact_shuffle(spark, frames):
    fact, dim = frames
    plan = fk_validate(fact, dim, "epci_key", "key")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fk_orphans_returns_only_dangling_non_null(spark, frames):
    fact, dim = frames
    bad = fk_orphans(fact, dim, "epci_key", "key").collect()
    assert [r["id"] for r in bad] == [3]  # null FK (id 4) is NOT an orphan


def test_fk_orphans_empty_when_integral(spark, frames):
    fact, dim = frames
    clean = fact.filter(F.col("id").isin(1, 2, 4))
    assert fk_orphans(clean, dim, "epci_key", "key").count() == 0
    assert_fk(clean, dim, "epci_key", "key")  # no raise


def test_assert_fk_raises_with_sample(spark, frames):
    fact, dim = frames
    with pytest.raises(AssertionError, match="epci_key"):
        assert_fk(fact, dim, "epci_key", "key")
