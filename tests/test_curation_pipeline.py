"""Capstone: the training-data curation pipeline end-to-end on the
engine's own primitives — documents arrive as CDC, the near-dup index is
maintained incrementally, and the curated/split/sharded corpus is a pure
deterministic function of the table state.

CDC docs table ──cascade──▶ near-dup index ──probe──▶ drop dups
      │                                                   │
      └── quality gate ── split assignment ── token shards ┘

Every stage is deterministic, so the whole pipeline re-run from the same
table state reproduces byte-identical curation decisions — the property
that makes a 100-TB curation run resumable and auditable."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.neardup_index import NearDupIndex
from french_admin_etl_spark.operators.packing import token_shards
from french_admin_etl_spark.operators.sampling import split_assign
from french_admin_etl_spark.streaming.cascade import CascadeJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable

DOCS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
_EV = "doc_id long, text string, lsn long, op string"


def _curate(spark, docs_table, idx, new_ids):
    """Deterministic curation of the current table state: drop the lower
    id of every near-dup candidate pair touching the increment, gate on
    a minimal quality bar, then split and shard."""
    dup_losers = idx.probe(new_ids).select(F.col("id_a").alias("doc_id")).distinct()
    corpus = docs_table.read().join(dup_losers, ["doc_id"], "left_anti")
    gated = corpus.filter(F.length("text") >= 40).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    split = split_assign(gated, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    return token_shards(split, ["doc_id"], "n_chars", 500, out_col="shard")


def test_curation_pipeline_end_to_end_and_reproducible(spark, tmp_root):
    docs = LakeTable.create(
        spark, os.path.join(tmp_root, "docs"), schema=DOCS_SCHEMA,
        key_cols=["doc_id"], num_buckets=4, write_mode="mor",
    )
    idx = NearDupIndex.create(spark, os.path.join(tmp_root, "idx"), num_buckets=4)
    cascade = CascadeJob(
        spark, docs, idx.table, transform=idx.transform(), writer_id="cur"
    )
    ckpt = CheckpointStore(os.path.join(tmp_root, "cur.ck"))

    base = (
        "sentence number {i} about the quick brown fox jumping over the "
        "lazy dog near the quiet garden gate in the morning"
    )
    wave1 = [(i, base.format(i=i), i, "I") for i in range(1, 21)]
    docs.merge(spark.createDataFrame(wave1, _EV), batch_id=0)
    cascade.run_to_latest(ckpt)

    # wave 2: 3 fresh docs, one an exact near-dup of doc 5, one too short
    wave2 = [
        (21, base.format(i=5), 100, "I"),          # near-dup of doc 5
        (22, "short junk", 101, "I"),              # fails the quality gate
        (23, base.format(i=23) + " extended with new words", 102, "I"),
    ]
    docs.merge(spark.createDataFrame(wave2, _EV), batch_id=1)
    cascade.run_to_latest(ckpt)

    new_ids = spark.createDataFrame([(21,), (22,), (23,)], "doc_id long")
    out = _curate(spark, docs, idx, new_ids).collect()
    by_id = {r["doc_id"]: r for r in out}

    assert 22 not in by_id                       # quality-gated
    assert 5 not in by_id and 21 in by_id        # dup pair (5, 21): lower id dropped
    assert 23 in by_id                           # genuinely new doc kept
    splits = {r["split"] for r in out}
    assert splits <= {"train", "val", "test"} and "train" in splits
    shards = sorted({r["shard"] for r in out})
    assert shards == list(range(len(shards)))    # dense shard ids

    # reproducibility: the identical curation from the same table state
    again = _curate(spark, docs, idx, new_ids).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curation_survives_doc_deletion(spark, tmp_root):
    """Deleting a doc upstream flows through: its band rows tombstone,
    and the curated corpus no longer contains it."""
    docs = LakeTable.create(
        spark, os.path.join(tmp_root, "docs"), schema=DOCS_SCHEMA,
        key_cols=["doc_id"], num_buckets=4, write_mode="mor",
    )
    idx = NearDupIndex.create(spark, os.path.join(tmp_root, "idx"), num_buckets=4)
    cascade = CascadeJob(
        spark, docs, idx.table, transform=idx.transform(), writer_id="cur"
    )
    ckpt = CheckpointStore(os.path.join(tmp_root, "cur.ck"))
    text = (
        "a long enough document body that clears the quality gate with "
        "room to spare for the token sharder"
    )
    docs.merge(
        spark.createDataFrame([(1, text, 1, "I"), (2, text + " two", 2, "I")], _EV),
        batch_id=0,
    )
    cascade.run_to_latest(ckpt)
    docs.merge(spark.createDataFrame([(2, None, 3, "D")], _EV), batch_id=1)
    cascade.run_to_latest(ckpt)
    new_ids = spark.createDataFrame([(1,)], "doc_id long")
    out = _curate(spark, docs, idx, new_ids).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert {r[0] for r in idx.table.read().select("doc_id").collect()} == {1}
