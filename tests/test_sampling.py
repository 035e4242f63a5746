"""Deterministic sampling / dataset splitting (training-data curation)."""

import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_quota,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "lang"
    )


def test_hash_sample_is_partitioning_invariant(spark, docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), ["doc_id"], 0.3).collect()
    )
    assert a == b and 0.2 < len(a) / docs.count() < 0.4


def test_split_assign_total_proportional_and_leakage_free(spark, docs):
    out = split_assign(docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # total: every row labeled exactly once
    assert 0.7 < counts["train"] / n < 0.9
    # redelivered duplicate keys land in the SAME split (no leakage)
    dup = split_assign(
        docs.unionAll(docs), ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert dup.groupBy("doc_id").agg(
        F.countDistinct("split").alias("k")
    ).filter(F.col("k") > 1).count() == 0


def test_split_assign_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, ["doc_id"], {"train": 0.8, "val": 0.1})


def test_stratified_sample_rates_and_default(spark, docs):
    out = stratified_sample(
        docs, ["lang"], {"en": 0.5, "fr": 0.25}, ["doc_id"], default_fraction=0.0
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"en", "fr"}  # default 0 drops unlisted strata
    assert 0.35 < got["en"] / base["en"] < 0.65
    assert 0.1 < got["fr"] / base["fr"] < 0.45


def test_uniform_hash_distinguishes_null_positions(spark):
    """concat_ws skips nulls; the sentinel encoding must keep
    ('x', NULL, 'y') and ('x', 'y', NULL) on distinct draws."""
    from french_admin_etl_spark.operators.sampling import uniform_hash

    df = spark.createDataFrame(
        [("x", None, "y"), ("x", "y", None)], "a string, b string, c string"
    )
    u = [r["u"] for r in df.select(uniform_hash(["a", "b", "c"]).alias("u")).collect()]
    assert u[0] != u[1]


def test_stratified_sample_typed_strata(spark):
    """Boolean (non-string) strata must match by typed equality, not by
    Python str() rendering ('True' vs Spark's 'true')."""
    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(400)], "doc_id long, is_code boolean"
    )
    out = stratified_sample(
        df, ["is_code"], {True: 1.0, False: 0.0}, ["doc_id"], default_fraction=0.0
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [i for i in range(400) if i % 2 == 0]


def test_stratified_quota_exact_and_stable(spark, docs):
    out = stratified_quota(docs, ["lang"], 30, ["doc_id"])
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {k: min(30, v) for k, v in base.items()}
    again = stratified_quota(docs.repartition(5), ["lang"], 30, ["doc_id"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_uniform_hash_separator_injection_resistant(spark):
    """Review finding: a bare '|' join let ('x|y', 'z') and ('x', 'y|z')
    concatenate identically — distinct keys with perfectly correlated
    draws. Length-prefixed encoding must give them independent draws."""
    from french_admin_etl_spark.operators.sampling import uniform_hash

    df = spark.createDataFrame(
        [("x|y", "z"), ("x", "y|z"), ("x|", "y|z"), ("x", "|y|z")],
        "a string, b string",
    )
    u = [r["u"] for r in df.select(uniform_hash(["a", "b"]).alias("u")).collect()]
    assert len(set(u)) == 4, u
