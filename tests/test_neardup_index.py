"""Incremental MinHash/LSH near-dup index maintained over a document
table's CDC stream: parity with a from-scratch rebuild, O(increment)
probing, exactly-once maintenance."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.neardup_index import NearDupIndex
from french_admin_etl_spark.operators.textdedup import lsh_candidate_pairs, minhash_signature
from french_admin_etl_spark.streaming.cascade import CascadeJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
from french_admin_etl_spark.table.lake_table import LakeTable

DOCS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
_EV = "doc_id long, text string, lsn long, op string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill near the quiet garden gate"
)
OTHER = (
    "completely different content describing shuffle partitioning and "
    "adaptive execution in distributed query engines at large scale"
)


def _setup(spark, tmp_root):
    docs = LakeTable.create(
        spark, os.path.join(tmp_root, "docs"), schema=DOCS_SCHEMA,
        key_cols=["doc_id"], num_buckets=4, write_mode="mor",
    )
    idx = NearDupIndex.create(
        spark, os.path.join(tmp_root, "ndidx"), num_buckets=4,
        num_hashes=16, bands=4,
    )
    cascade = CascadeJob(
        spark, docs, idx.table, transform=idx.transform(), writer_id="ndidx"
    )
    ckpt = CheckpointStore(os.path.join(tmp_root, "nd.ck"))
    return docs, idx, cascade, ckpt


def _index_rows(idx):
    return sorted(
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in idx.table.read().collect()
    )


def _rebuild_rows(idx, docs):
    return sorted(
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in idx.rebuild_rows(docs.read()).collect()
    )


def test_incremental_index_equals_rebuild_across_waves(spark, tmp_root):
    docs, idx, cascade, ckpt = _setup(spark, tmp_root)
    # wave 1: two near-dups + one distinct doc
    docs.merge(
        spark.createDataFrame(
            [(1, BASE, 1, "I"), (2, BASE + " extra", 2, "I"), (3, OTHER, 3, "I")],
            _EV,
        ),
        batch_id=0,
    )
    cascade.run_to_latest(ckpt)
    assert _index_rows(idx) == _rebuild_rows(idx, docs)
    assert len(_index_rows(idx)) == 3 * idx.bands

    # wave 2: new near-dup of 1, rewrite 3, delete 2, and a short doc
    # (short texts shingle as one whole-text gram — they still index)
    docs.merge(
        spark.createDataFrame(
            [
                (4, BASE + " trailing words", 4, "I"),
                (3, OTHER + " revised edition", 5, "U"),
                (2, None, 6, "D"),
                (5, "too short", 7, "I"),
            ],
            _EV,
        ),
        batch_id=1,
    )
    cascade.run_to_latest(ckpt)
    assert _index_rows(idx) == _rebuild_rows(idx, docs)
    ids = {r[0] for r in _index_rows(idx)}
    assert ids == {1, 3, 4, 5}  # 2 deleted

    # a null-text rewrite stays indexed (word_shingles yields the one
    # degenerate "" shingle — same in batch and incremental, so parity is
    # the contract) and a delete clears the rows
    docs.merge(
        spark.createDataFrame([(4, None, 8, "U"), (5, None, 9, "D")], _EV),
        batch_id=2,
    )
    cascade.run_to_latest(ckpt)
    assert _index_rows(idx) == _rebuild_rows(idx, docs)
    assert {r[0] for r in _index_rows(idx)} == {1, 3, 4}


def test_maintenance_is_exactly_once(spark, tmp_root):
    docs, idx, cascade, ckpt = _setup(spark, tmp_root)
    docs.merge(
        spark.createDataFrame([(1, BASE, 1, "I"), (2, BASE, 2, "I")], _EV),
        batch_id=0,
    )
    cascade.run_to_latest(ckpt)
    before = _index_rows(idx)
    # nothing new -> noop; rewound checkpoint -> fenced replay; both inert
    assert cascade.run_once(ckpt).mode == "noop"
    ckpt.save({"from_version": 0, "batch_id": 0})
    r = cascade.run_once(ckpt)
    assert r.merge is not None and r.merge.fenced
    assert _index_rows(idx) == before


def test_probe_matches_batch_operator_on_increment(spark, tmp_root):
    docs, idx, cascade, ckpt = _setup(spark, tmp_root)
    wave1 = [(1, BASE), (2, BASE + " extra"), (3, OTHER)]
    docs.merge(
        spark.createDataFrame([(i, t, i, "I") for i, t in wave1], _EV), batch_id=0
    )
    cascade.run_to_latest(ckpt)
    wave2 = [(4, BASE + " trailing words"), (5, OTHER + " appendix")]
    docs.merge(
        spark.createDataFrame([(i, t, 10 + i, "I") for i, t in wave2], _EV),
        batch_id=1,
    )
    cascade.run_to_latest(ckpt)

    new_ids = spark.createDataFrame([(4,), (5,)], "doc_id long")
    got = sorted(
        (r["id_a"], r["id_b"]) for r in idx.probe(new_ids).collect()
    )
    # oracle: the batch operator over the FULL current corpus, restricted
    # to pairs touching the increment
    sig = minhash_signature(docs.read(), "doc_id", "text", idx.num_hashes, idx.shingle_n)
    full = lsh_candidate_pairs(sig, "doc_id", idx.num_hashes, idx.bands)
    want = sorted(
        (r["id_a"], r["id_b"])
        for r in full.filter(
            F.col("id_a").isin([4, 5]) | F.col("id_b").isin([4, 5])
        ).collect()
    )
    assert got == want and got  # non-empty: 4 is a near-dup of 1 (and 2)


def test_probe_pushdown_path_equals_unpushed(spark, tmp_root):
    docs, idx, cascade, ckpt = _setup(spark, tmp_root)
    docs.merge(
        spark.createDataFrame(
            [(i, f"{BASE} variant {i % 3}", i, "I") for i in range(1, 13)], _EV
        ),
        batch_id=0,
    )
    cascade.run_to_latest(ckpt)
    new_ids = spark.createDataFrame([(11,), (12,)], "doc_id long")
    pushed = sorted(map(tuple, idx.probe(new_ids, max_pushdown=10_000).collect()))
    scanned = sorted(map(tuple, idx.probe(new_ids, max_pushdown=0).collect()))
    assert pushed == scanned and pushed
