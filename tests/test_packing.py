"""Corpus packing: distributed prefix sum + token-budget shards."""

import pytest
from pyspark.sql import functions as F

from french_admin_etl_spark.operators.packing import prefix_sum, token_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "n_chars"
    )


def test_prefix_sum_matches_pandas_cumsum(spark, docs):
    got = {
        r["doc_id"]: r["cum"]
        for r in prefix_sum(docs.repartition(13), ["doc_id"], "n_chars").collect()
    }
    pdf = docs.toPandas().sort_values("doc_id")
    want = dict(zip(pdf["doc_id"], pdf["n_chars"].cumsum()))
    assert got == want


def test_prefix_sum_invariant_to_partition_count(spark, docs):
    a = sorted(map(tuple, prefix_sum(docs, ["doc_id"], "n_chars", num_partitions=2).collect()))
    b = sorted(map(tuple, prefix_sum(docs, ["doc_id"], "n_chars", num_partitions=16).collect()))
    assert a == b


def test_prefix_sum_avoids_single_partition_exchange(spark, docs):
    """The whole point vs `sum over (order by ...)`: the plan must not
    funnel the corpus through one task."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        prefix_sum(docs, ["doc_id"], "n_chars").explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    # the naive formulation DOES (sanity check of the assertion itself)
    from pyspark.sql import Window

    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        docs.withColumn(
            "cum",
            F.sum("n_chars").over(
                Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).explain("formatted")
    assert "SinglePartition" in buf2.getvalue()


def test_token_shards_greedy_packing_properties(spark, docs):
    budget = 50_000
    out = token_shards(docs, ["doc_id"], "n_chars", budget)
    agg = (
        out.groupBy("shard")
        .agg(F.sum("n_chars").alias("tok"), F.max("n_chars").alias("mx"))
        .orderBy("shard")
        .collect()
    )
    shards = [r["shard"] for r in agg]
    assert shards == list(range(len(shards)))  # dense ids from 0
    # every closed shard reaches its budget; overflow <= one document
    for r in agg[:-1]:
        assert r["tok"] >= budget - r["mx"]
        assert r["tok"] <= budget + r["mx"]
    # deterministic under repartition
    again = token_shards(docs.repartition(7), ["doc_id"], "n_chars", budget)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_token_shards_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError, match="positive"):
        token_shards(docs, ["doc_id"], "n_chars", 0)
