"""Corpus packing: global prefix sums and token-budget shard assignment.

Writing training shards of ~N tokens each needs a GLOBAL running total
in a deterministic document order. The naive Spark formulation —
``sum(x) over (order by k)`` with no partition key — range-exchanges
every row into ONE task (the plan shows ``Exchange SinglePartition``):
a non-starter at corpus scale. :func:`prefix_sum` is the classic
two-phase scan instead:

1. range-repartition by the order columns (parallel, order-preserving
   across partitions);
2. one tiny job collects per-partition totals (bounded by the partition
   count, not the data) and turns them into exclusive offsets;
3. each partition computes its LOCAL running sum in parallel and adds
   its broadcast offset.

Where the range boundaries fall does not affect the result — only the
total order does — so sampling jitter in ``repartitionByRange`` is
harmless; the order columns must be a unique key for the order (and
therefore the sum) to be well-defined.

:func:`token_shards` assigns each document the shard its PRECEDING
cumulative token count falls into (``prev_cum div budget``) — greedy
sequential packing: every shard overflows its budget by at most one
document, shard ids are dense from 0, and the assignment is a pure
function of the ordered corpus (stable across reruns and partitionings).
Integer ``div`` avoids double rounding past 2^53 on corpus-scale token
totals. No reference analog; standard large-corpus training-prep shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` in the global order of
    ``order_cols`` (which must be unique), without a single-task window."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(n), *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()  # partition ids must agree between both reads
    totals = {
        r["_pid"]: r["_t"]
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t")).collect()
    }
    acc, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.lit(0).cast("long")
    for pid, o in offsets.items():
        if o:
            off = F.when(F.col("_pid") == pid, F.lit(o).cast("long")).otherwise(off)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn(out_col, (F.sum(value_col).over(w) + off).cast("long"))
        .drop("_pid")
    )


def token_shards(
    df: DataFrame,
    order_cols: list[str],
    token_col: str,
    shard_tokens: int,
    out_col: str = "shard",
) -> DataFrame:
    """Greedy sequential packing: shard id = (exclusive prefix of tokens)
    div ``shard_tokens``. Deterministic given the order; each shard holds
    at least ``shard_tokens`` tokens once closed (overflow ≤ one doc)."""
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    cum = prefix_sum(df, order_cols, token_col, out_col="_cum")
    return (
        cum.withColumn("_prev", (F.col("_cum") - F.col(token_col)).cast("long"))
        .withColumn(out_col, F.expr(f"_prev div {int(shard_tokens)}"))
        .drop("_cum", "_prev")
    )
