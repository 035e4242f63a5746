"""Incremental sign-LSH ANN index maintained over a vector table's CDC
stream: rebuild parity, probe == batch ANN, deletes, exactly-once."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.ann_index import AnnIndex
from french_admin_etl_spark.operators.similarity import signature_bucket_ann
from french_admin_etl_spark.streaming.cascade import CascadeJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)
_EV = "vec_id long, embedding array<float>, lsn long, op string"


def _setup(spark, tmp_root):
    vectors = LakeTable.create(
        spark, os.path.join(tmp_root, "vecs"), schema=VEC_SCHEMA,
        key_cols=["vec_id"], num_buckets=4, write_mode="mor",
    )
    idx = AnnIndex.create(spark, os.path.join(tmp_root, "annidx"), num_buckets=4)
    cascade = CascadeJob(
        spark, vectors, idx.table, transform=idx.transform(), writer_id="ann"
    )
    return vectors, idx, cascade, CheckpointStore(os.path.join(tmp_root, "ann.ck"))


def _emb_rows(spark, n, seed, base_lsn=0, op="I"):
    import numpy as np

    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(0, 1, 16)], base_lsn + i, op)
            for i in range(1, n + 1)
        ],
        _EV,
    )


def _index_rows(idx):
    return sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in idx.table.read().collect()
    )


def test_ann_index_equals_rebuild_across_waves(spark, tmp_root):
    vectors, idx, cascade, ckpt = _setup(spark, tmp_root)
    vectors.merge(_emb_rows(spark, 30, seed=1), batch_id=0)
    cascade.run_to_latest(ckpt)
    want = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in idx.rebuild_rows(vectors.read()).collect()
    )
    assert _index_rows(idx) == want and len(want) == 30

    # wave 2: negate some embeddings (bucket moves), delete some
    negs = vectors.read().filter(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        (F.lit(100) + F.col("vec_id")).alias("lsn"),
        F.lit("U").alias("op"),
    )
    dels = spark.createDataFrame(
        [(i, None, 200 + i, "D") for i in (7, 14)], _EV
    )
    vectors.merge(negs.unionByName(dels), batch_id=1)
    cascade.run_to_latest(ckpt)
    want2 = sorted(
        (r["vec_id"], r["bucket"], tuple(r["embedding"]))
        for r in idx.rebuild_rows(vectors.read()).collect()
    )
    assert _index_rows(idx) == want2
    ids = {r[0] for r in _index_rows(idx)}
    assert 7 not in ids and 14 not in ids and len(ids) == 28


def test_ann_probe_matches_batch_operator(spark, tmp_root):
    vectors, idx, cascade, ckpt = _setup(spark, tmp_root)
    vectors.merge(_emb_rows(spark, 40, seed=2), batch_id=0)
    cascade.run_to_latest(ckpt)
    new = spark.createDataFrame(
        [(100 + i, [float((i + 1) * (0.5 - (j % 2))) for j in range(16)], 500 + i, "I")
         for i in range(3)],
        _EV,
    )
    vectors.merge(new, batch_id=1)
    cascade.run_to_latest(ckpt)
    new_ids = spark.createDataFrame([(100,), (101,), (102,)], "vec_id long")
    got = {
        (r["q_id"], r["vec_id"]): round(r["cos_sim"], 6)
        for r in idx.probe(new_ids, k=5, probe_flips=2).collect()
    }
    # oracle: the batch operator over the full current index, per query
    corpus = idx.table.read().select("vec_id", "embedding")
    want = {}
    for qid in (100, 101, 102):
        q = corpus.filter(F.col("vec_id") == qid).select(
            F.lit(qid).alias("q_id"), F.col("embedding").alias("q_emb")
        )
        rest = corpus.filter(F.col("vec_id") != qid)
        for r in signature_bucket_ann(rest, q, k=5, bits=8, probe_flips=2).collect():
            want[(qid, r["vec_id"])] = round(r["cos_sim"], 6)
    assert got == want and got


def test_ann_maintenance_is_exactly_once(spark, tmp_root):
    vectors, idx, cascade, ckpt = _setup(spark, tmp_root)
    vectors.merge(_emb_rows(spark, 10, seed=3), batch_id=0)
    cascade.run_to_latest(ckpt)
    before = _index_rows(idx)
    assert cascade.run_once(ckpt).mode == "noop"
    ckpt.save({"from_version": 0, "batch_id": 0})
    r = cascade.run_once(ckpt)
    assert r.merge is not None and r.merge.fenced
    assert _index_rows(idx) == before


def test_probe_rejects_wide_id_frame_and_accepts_id_col(spark, tmp_root):
    """Review finding: probe took new_ids.columns[0] positionally — a
    (lsn, vec_id) frame silently probed lsn values as ids."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from french_admin_etl_spark.operators.ann_index import AnnIndex

    idx = AnnIndex.create(spark, os.path.join(tmp_root, "annidx_wide"), num_buckets=2)
    rows = idx.rebuild_rows(
        spark.createDataFrame(
            [(1, [1.0, 0.5]), (2, [1.0, 0.4]), (3, [-1.0, 0.2])],
            "vec_id long, embedding array<float>",
        )
    )
    idx.table.overwrite(rows)
    wide = spark.createDataFrame([(999, 1)], "lsn long, vec_id long")
    with _pytest.raises(ValueError, match="pass id_col"):
        idx.probe(wide)
    got = idx.probe(wide, k=2, id_col="vec_id").collect()
    assert {r["q_id"] for r in got} == {1}
    assert all(r["vec_id"] != 1 for r in got)


def test_rebuild_bucket_matches_transform_on_denormal_doubles(spark, tmp_root):
    """Review finding: rebuild_rows hashed the RAW vector column while
    transform hashed the float-cast embedding — a double component inside
    the float-denormal gap (+1e-46 -> float 0.0) flipped one bucket bit
    between the maintained index and its parity oracle."""
    import os

    from pyspark.sql import functions as F

    from french_admin_etl_spark.operators.ann_index import AnnIndex
    from french_admin_etl_spark.operators.similarity import sign_bucket

    idx = AnnIndex.create(spark, os.path.join(tmp_root, "annidx_den"), num_buckets=2)
    vecs = spark.createDataFrame(
        [(1, [1e-46, 1.0]), (2, [1.0, -1e-46])], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["bucket"] for r in idx.rebuild_rows(vecs).collect()}
    want = {
        r["vec_id"]: r["b"]
        for r in vecs.select(
            "vec_id",
            sign_bucket(F.col("embedding").cast("array<float>"), idx.bits).alias("b"),
        ).collect()
    }
    assert got == want  # 1e-46 casts to float 0.0: bit must be CLEAR in both
    assert got[1] & 1 == 0 and got[2] & 1 == 1
