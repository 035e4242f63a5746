"""Corpus packing: global prefix sums and token-budget shard assignment.

Writing training shards of ~N tokens each needs a GLOBAL running total
in a deterministic document order. The naive Spark formulation —
``sum(x) over (order by k)`` with no partition key — range-exchanges
every row into ONE task (the plan shows ``Exchange SinglePartition``):
a non-starter at corpus scale. :func:`prefix_sum` is the classic
two-phase scan instead:

1. split the order domain into range buckets (approx-percentile bounds
   of the first order column, embedded as literals);
2. one tiny job collects per-bucket totals (bounded by the bucket
   count, not the data) and turns them into exclusive offsets;
3. each bucket computes its LOCAL running sum in parallel and adds its
   broadcast offset.

Where the bucket boundaries fall does not affect the result — only the
total order does — so percentile-sketch jitter is harmless; the order
columns must be a unique key for the order (and therefore the sum) to
be well-defined.

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
    materialize: bool = True,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` in the global order of
    ``order_cols`` (which must be unique), without a single-task window.
    The first order column must be numeric/temporal (range bucketing);
    ``materialize=True`` (default) localCheckpoints the input so the
    three passes (bounds, totals, windows) run the upstream plan once.

    The range buckets come from driver-collected approx-percentile bounds
    of the FIRST order column, embedded as literals — the bucket id is a
    pure function of the row, so the totals job and the window job can
    never disagree about who owns a row (``spark_partition_id`` after a
    sampled repartitionByRange can, between separate executions), and
    nothing needs to be pinned in the cache. Rows equal on the first
    order column share a bucket; the window's full ordering handles them.
    Cost: one percentile agg + one totals agg (both combinable) + the
    partition-local windows.
    """
    if num_partitions is not None:
        if num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
        n = int(num_partitions)
    else:
        # shuffle.partitions can be non-numeric under AQE auto-tuning
        # (e.g. 'auto' on some platforms) — fall back to the cluster's
        # default parallelism instead of crashing on int() (review
        # finding; `num_partitions or conf` also mistreated an explicit
        # 0, now rejected above)
        conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        try:
            n = int(conf)
        except (TypeError, ValueError):
            n = df.sparkSession.sparkContext.defaultParallelism
    first_t = df.schema[order_cols[0]].dataType.typeName()
    if first_t not in (
        "byte", "short", "integer", "long", "float", "double", "decimal",
        "date", "timestamp", "timestamp_ntz",
    ):
        raise TypeError(
            f"prefix_sum range-buckets on the first order column, which must "
            f"be numeric/temporal for percentile bounds; got {order_cols[0]}: "
            f"{first_t} — order by a numeric surrogate (e.g. a dense id) and "
            f"keep the string key as a secondary column"
        )
    if materialize:
        # the bounds job, the totals job, and the final window job would
        # otherwise each re-run the upstream plan (3x an expensive
        # tokenization/join); localCheckpoint executes it once and is
        # reclaimed when the result is garbage-collected
        df = df.localCheckpoint(eager=True)
    oc = F.col(order_cols[0])
    pid = F.lit(0)
    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = (
            df.select(F.percentile_approx(oc, qs, 10_000).alias("b")).collect()[0]["b"]
            or []
        )
        for b in bounds:
            pid = pid + F.when(oc > F.lit(b), 1).otherwise(0)
    part = df.withColumn("_pid", pid.cast("int"))
    totals = {
        r["_pid"]: r["_t"]
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("_t")).collect()
    }
    acc, offsets = 0, {}
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p] or 0
    off = F.lit(0).cast("long")
    for p, o in offsets.items():
        if o:
            off = F.when(F.col("_pid") == p, F.lit(o).cast("long")).otherwise(off)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return part.withColumn(out_col, (F.sum(value_col).over(w) + off).cast("long")).drop(
        "_pid"
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
