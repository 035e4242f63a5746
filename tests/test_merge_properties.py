"""Property-based MERGE semantics: for ANY op sequence and ANY batching,
replaying into a LakeTable converges to the max-LSN oracle state.

Hypothesis generates adversarial cases the fixture-based suites can't
enumerate: delete-then-reinsert chains, duplicate keys across batches,
stale updates landing after deletes, single-key floods — under both COW
and MOR write modes. This is the engine's core invariant (north_rule:
"replay … reconverges to the identical final table state").
"""

from __future__ import annotations

import os
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from french_admin_etl_spark.operators.dedup import dedup_max_seq
from french_admin_etl_spark.table.lake_table import LakeTable

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

KEYS = ["k0", "k1", "k2"]

# one op: (key_idx, op, value); LSN = position in the list (total order)
ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=len(KEYS) - 1),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=16,
)
# batch split points as a set of positions
splits_strategy = st.sets(st.integers(min_value=1, max_value=15), max_size=3)


def _oracle(events):
    state = {}
    for lsn, key, op, val in events:
        state[key] = (lsn, op, val)  # events arrive in LSN order here
    return {
        k: f"v{val}" for k, (lsn, op, val) in state.items() if op != "D"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=ops_strategy, splits=splits_strategy)
def test_any_ops_any_batching_converges_to_oracle_both_modes(
    spark, tmp_path_factory, ops, splits
):
    """Every generated (op sequence, batching) is replayed into BOTH a COW
    and a MOR table: each must equal the max-LSN oracle AND each other —
    write_mode must never change final state (round-2 advice)."""
    events = [
        (lsn, KEYS[ki], op, val) for lsn, (ki, op, val) in enumerate(ops)
    ]
    bounds = sorted(b for b in splits if b < len(events))
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        if b > prev:
            batches.append(events[prev:b])
            prev = b
    states = {}
    for write_mode in ("cow", "mor"):
        root = os.path.join(str(tmp_path_factory.mktemp("prop")), uuid.uuid4().hex)
        table = LakeTable.create(
            spark, root, SCHEMA, ["repo", "path"], num_buckets=2, write_mode=write_mode
        )
        for i, batch in enumerate(batches):
            src = spark.createDataFrame(
                [(lsn, op, "r", key, f"v{val}") for lsn, key, op, val in batch],
                "lsn long, op string, repo string, path string, content string",
            )
            table.merge(dedup_max_seq(src, ["repo", "path"], "lsn"), batch_id=i)
        states[write_mode] = {r["path"]: r["content"] for r in table.read().collect()}
    assert states["cow"] == _oracle(events)
    assert states["cow"] == states["mor"]
