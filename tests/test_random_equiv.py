"""Seeded-random equivalence properties for the round-3 machinery.

- WAP branches: staging a random suffix of the batch sequence on a
  branch and publishing must equal merging every batch directly — the
  branch is a pure visibility device, never a semantics change.
- JoinView: after every random wave of left/right CDC ops, the
  maintained view equals the declarative left join recomputed from
  scratch.

Deterministic random (seeded) so failures replay exactly.
"""

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.streaming.joinview import JoinView
from french_admin_etl_spark.table.lake_table import LakeTable

ST = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
)


def _gen_batches(seed, n_batches=6, keys=16, per_batch=10):
    """Random CDC batches, one event per key per batch (the merge
    contract), globally increasing LSNs with occasional ties."""
    rng = random.Random(seed)
    lsn = 0
    batches = []
    for _ in range(n_batches):
        ks = rng.sample([f"k{i}" for i in range(keys)], per_batch)
        rows = []
        for k in ks:
            if rng.random() < 0.25:
                lsn += rng.choice([0, 1])  # ties across batches happen
            else:
                lsn += rng.randint(1, 3)
            op = "D" if rng.random() < 0.15 else rng.choice(["I", "U"])
            v = None if op == "D" else rng.randint(0, 999)
            rows.append((k, v, lsn, op))
        batches.append(rows)
    return batches


def _merge_all(spark, t, batches, start=0, branch=None):
    sink = branch if branch is not None else t
    for i, rows in enumerate(batches):
        sink.merge(
            spark.createDataFrame(rows, "k string, v int, lsn long, op string"),
            batch_id=start + i,
        )


def _state(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_branch_publish_equals_direct_merges(spark, tmp_root, seed):
    batches = _gen_batches(seed)
    direct = LakeTable.create(
        spark, os.path.join(tmp_root, f"d{seed}"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    _merge_all(spark, direct, batches)

    staged = LakeTable.create(
        spark, os.path.join(tmp_root, f"s{seed}"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    cut = 2
    _merge_all(spark, staged, batches[:cut])
    br = staged.branch("audit")
    _merge_all(spark, staged, batches[cut:], start=cut, branch=br)
    br.publish()
    assert _state(staged) == _state(direct)
    # and compaction preserves the published resolution
    staged.compact(include_clean=True)
    assert _state(staged) == _state(direct)


@pytest.mark.parametrize("seed", [5, 41])
def test_joinview_random_waves_match_declarative_truth(spark, tmp_root, seed):
    rng = random.Random(seed)
    left = LakeTable.create(
        spark, os.path.join(tmp_root, f"l{seed}"),
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("fk", T.StringType()),
            T.StructField("val", T.IntegerType()),
        ]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    right = LakeTable.create(
        spark, os.path.join(tmp_root, f"r{seed}"),
        T.StructType([
            T.StructField("code", T.StringType()),
            T.StructField("label", T.StringType()),
        ]),
        ["code"], num_buckets=2, write_mode="mor",
    )
    dims = [f"d{i}" for i in range(6)]
    right.merge(
        spark.createDataFrame(
            [(d, f"L-{d}", i + 1, "I") for i, d in enumerate(dims[:4])],
            "code string, label string, lsn long, op string",
        ),
        batch_id=0,
    )
    left.merge(
        spark.createDataFrame(
            [(f"x{i}", rng.choice(dims), i, 10 + i, "I") for i in range(20)],
            "id string, fk string, val int, lsn long, op string",
        ),
        batch_id=0,
    )
    jv = JoinView.create(
        spark, left, right, os.path.join(tmp_root, f"v{seed}"),
        on=[("fk", "code")], select={"label": "label"},
    )
    jv.sync()

    def truth():
        r = right.read().select(F.col("code").alias("_c"), "label")
        return {
            tuple(sorted(row.asDict().items()))
            for row in left.read()
            .join(r, on=F.col("fk") == F.col("_c"), how="left")
            .drop("_c")
            .collect()
        }

    lsn = 1000
    for wave in range(3):
        lrows, rrows = [], []
        for i in rng.sample(range(20), 6):
            lsn += 1
            if rng.random() < 0.2:
                lrows.append((f"x{i}", None, None, lsn, "D"))
            else:
                lrows.append((f"x{i}", rng.choice(dims), rng.randint(0, 99), lsn, "U"))
        for d in rng.sample(dims, 2):
            lsn += 1
            if rng.random() < 0.25:
                rrows.append((d, None, lsn, "D"))
            else:
                rrows.append((d, f"L-{d}-w{wave}", lsn, "U"))
        left.merge(
            spark.createDataFrame(lrows, "id string, fk string, val int, lsn long, op string"),
            batch_id=wave + 1,
        )
        right.merge(
            spark.createDataFrame(rrows, "code string, label string, lsn long, op string"),
            batch_id=wave + 1,
        )
        r = jv.sync()
        assert r["mode"] in ("incremental", "empty"), r
        got = {tuple(sorted(row.asDict().items())) for row in jv.read().collect()}
        assert got == truth(), f"wave {wave} diverged"


@pytest.mark.parametrize("seed", [13])
def test_restore_reproduces_every_historical_state(spark, tmp_root, seed):
    """Time-travel + RESTORE sweep: over a random history with
    interleaved maintenance (compact, rebucket), restoring to each
    recorded version must reproduce exactly the state the oracle had at
    that point — then the stream resumes on top (fences reverted with
    the state, so re-merging the undone batches reconverges)."""
    batches = _gen_batches(seed, n_batches=5, keys=12, per_batch=8)
    t = LakeTable.create(
        spark, os.path.join(tmp_root, f"tt{seed}"), ST, ["k"], num_buckets=2,
        write_mode="mor",
    )
    oracle: dict = {}
    checkpoints = []  # (version, expected state dict)
    rng = random.Random(seed)
    for i, rows in enumerate(batches):
        t.merge(
            spark.createDataFrame(rows, "k string, v int, lsn long, op string"),
            batch_id=i,
        )
        # oracle replay: max-lsn wins per key within/across batches (the
        # generator emits one event per key per batch, ascending lsns)
        for k, v, lsn, op in rows:
            prev = oracle.get(k)
            if prev is None or lsn >= prev[0]:
                oracle[k] = (lsn, None if op == "D" else v, op == "D")
        if i == 2:
            t.compact(include_clean=True)
        if i == 3:
            t.rebucket(4)
        checkpoints.append(
            (t.current_version(), {k: v for k, (_, v, dead) in oracle.items() if not dead})
        )
    final_exp = checkpoints[-1][1]
    assert _state(t) == final_exp
    # restore to a RANDOM mid-history version, check, then re-apply the
    # undone batches and reconverge to the final state
    v_mid, exp_mid = checkpoints[rng.randrange(1, len(checkpoints) - 1)]
    idx = next(i for i, (v, _) in enumerate(checkpoints) if v == v_mid)
    t.restore(v_mid)
    assert _state(t) == exp_mid
    for j in range(idx + 1, len(batches)):
        t.merge(
            spark.createDataFrame(batches[j], "k string, v int, lsn long, op string"),
            batch_id=j,
        )
    assert _state(t) == final_exp
    # and every checkpoint is still time-travel-readable post-restore
    for v, exp in checkpoints:
        assert {r["k"]: r["v"] for r in t.read(version=v).collect()} == exp


@pytest.mark.parametrize("seed", [11, 37])
def test_fk_index_gate_equals_scan_gate(spark, tmp_root, seed):
    """The FK-index-backed parent-delete gate is observationally
    equivalent to the full-scan gate: over the same randomized envelope
    stream — FK-consistent waves plus injected orphaning deletes — both
    dags (gate='post', on_violation='record') record violations for the
    SAME windows, and the final table states are identical."""
    import json as _json

    import pandas as pd

    from french_admin_etl_spark.datagen import gen_cog_events
    from french_admin_etl_spark.operators.secondary_index import SecondaryIndex
    from french_admin_etl_spark.sources.envelope_log import ENVELOPE_SCHEMA, MultiTableLog
    from french_admin_etl_spark.streaming.apply import CDCApplyJob
    from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
    from french_admin_etl_spark.streaming.dag import DagApplyJob, FKEdge
    from pyspark.sql import types as T

    rng = random.Random(seed)
    ev = gen_cog_events(
        n_regions=3, n_departments=8, n_communes=60, n_updates=200, seed=seed
    )
    # inject an orphaning delete: drop a department that still has live
    # communes, at a random point in the back half of the stream
    dept_codes = sorted(
        {
            _json.loads(p)["department_code"]
            for op, t, p in zip(ev["op"], ev["table"], ev["payload"])
            if t == "commune" and op in ("I", "U") and p is not None
        }
    )
    victim = rng.choice(dept_codes)
    cut = rng.randrange(len(ev) // 2, len(ev))
    inj = pd.DataFrame(
        {
            "lsn": [0], "ts": pd.Timestamp("2024-06-01"), "op": ["D"],
            "table": ["department"], "payload": [_json.dumps({"code": victim})],
            "schema_version": 1, "props": None,
        }
    )
    ev = pd.concat([ev.iloc[:cut], inj, ev.iloc[cut:]], ignore_index=True)
    ev["lsn"] = range(1, len(ev) + 1)

    schemas = {
        "region": T.StructType(
            [T.StructField("code", T.StringType()), T.StructField("name", T.StringType())]
        ),
        "department": T.StructType(
            [
                T.StructField("code", T.StringType()),
                T.StructField("region_code", T.StringType()),
                T.StructField("name", T.StringType()),
            ]
        ),
        "commune": T.StructType(
            [
                T.StructField("code", T.StringType()),
                T.StructField("department_code", T.StringType()),
                T.StructField("name", T.StringType()),
                T.StructField("population", T.LongType()),
            ]
        ),
    }
    edges = [
        FKEdge("department", "region_code", "region", "code"),
        FKEdge("commune", "department_code", "department", "code"),
    ]
    log_dir = os.path.join(tmp_root, f"mlog{seed}")
    spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA).write.parquet(log_dir)

    def run(variant: str, use_index: bool):
        root = os.path.join(tmp_root, f"{variant}{seed}")
        jobs = {
            name: CDCApplyJob(
                spark,
                LakeTable.create(
                    spark, os.path.join(root, name), schema, ["code"],
                    num_buckets=4, write_mode="mor",
                ),
            )
            for name, schema in schemas.items()
        }
        fk_indexes = None
        if use_index:
            idx = SecondaryIndex.create(
                spark, jobs["commune"].table, os.path.join(root, "fkidx"),
                ["department_code"],
            )
            fk_indexes = {
                ("commune", "department_code"):
                    (idx, CheckpointStore(os.path.join(root, "fkidx_ck.json")))
            }
        dag = DagApplyJob(
            jobs, edges, writer_id="dag", on_violation="record",
            fk_indexes=fk_indexes,
        )
        results = dag.run_incremental(
            MultiTableLog(spark, log_dir),
            CheckpointStore(os.path.join(root, "ck.json")),
            batch_lsns=60,
        )
        states = {
            n: sorted(
                tuple(r) for r in jobs[n].table.read().collect()
            )
            for n in schemas
        }
        return [(r.batch_id, len(r.violations)) for r in results], states

    v_scan, s_scan = run("scan", use_index=False)
    v_idx, s_idx = run("idx", use_index=True)
    assert v_idx == v_scan
    assert sum(n for _, n in v_idx) >= 1  # the injected orphan was caught
    assert s_idx == s_scan
