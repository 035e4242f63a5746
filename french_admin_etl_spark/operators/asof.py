"""As-of (point-in-time) join and range join — custom operators composed
from DataFrame primitives (no UDFs, no cross joins).

Neither exists as a Spark built-in; both are staples of CDC/event
analytics (attribute each event to the latest prior state of something).

**as-of join** (`asof_join`): for each left row, the single right row with
the greatest ``right_seq`` ≤ ``left_seq`` within the same key. Implemented
as the classic union+window composition (how Flink's temporal join and
kdb's aj execute):

    union(left tagged, right tagged)
      → window per key ordered by (seq, side)
      → last(right payload, ignorenulls) over rows unbounded-preceding
      → keep left rows

ONE shuffle (hash by key), sort within partition — at 100 TB this is a
single exchange, same cost class as any keyed window. Skewed keys put all
their rows in one task; if a key is truly massive, pre-split by seq-range
(coarse bucket of seq appended to the partition key) and as-of join within
buckets carrying forward the last value of the previous bucket — the
hook is left simple here because CDC keys (repo,path) are fine-grained.

**range join** (`point_in_interval_join`): points joined to enclosing
[lo, hi) intervals. A naive theta-join is a cross product; the scale form
quantizes both sides to coarse buckets of width ``bucket_width`` so the
physical join is an EQUI-join on bucket id (shuffle-hashable, prunable),
then exact-filters the range predicate. Intervals spanning b buckets emit
b rows (bounded by max interval length / bucket_width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_seq: str,
    right_seq: str,
    payload: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: latest right row with right_seq <= left_seq
    (strict=True: <) per key. Right ``payload`` columns (default: all
    non-key, non-seq right columns) appear on the output, null when no
    prior right row exists."""
    if payload is None:
        payload = [c for c in right.columns if c not in on and c != right_seq]

    # side ordering inside a seq tie decides inclusivity:
    # inclusive (<=): right first (0) so a same-seq right row matches;
    # strict (<): right last (1) so it does not.
    right_side = 1 if strict else 0
    left_side = 0 if strict else 1

    r = right.select(
        *on,
        F.col(right_seq).alias("_seq"),
        F.lit(right_side).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_pay"),
    )
    lcols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_seq).alias("_seq"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
    )
    unioned = l.unionByName(r.select(*on, "_seq", "_side", "_pay"), allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_seq"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == left_side).select(
        *[F.col(c) for c in lcols],
        *[F.col("_match")[c].alias(c) for c in payload],
    )
    return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with lo <= point < hi, via
    coarse-bucket equi-join + exact filter (no cross product).

    Degenerate intervals (hi <= lo, i.e. [lo, hi) empty — swapped columns
    or corrupt rows) are dropped up front: they match nothing by
    definition, and letting them reach ``F.sequence`` would generate a
    DESCENDING bucket sequence — one bad row exploding into
    O(|hi-lo|/width) spurious rows before the exact filter discards them
    (review finding).

    The range predicate rides INSIDE the join condition (Catalyst still
    extracts the bucket equality as the hash-join key and evaluates the
    rest as the join's residual filter), so ``how='left'`` has true
    left-outer semantics: a point inside no interval survives as ONE
    null-extended row. A post-join ``.filter`` would silently drop those
    rows — left degrading to inner (review finding)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"how={how!r}: use 'inner' or 'left'")
    p = points.withColumn(
        "_pb", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    i = intervals.withColumn(
        "_bs",
        F.sequence(
            F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
            F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)).cast("long"),
        ),
    ).withColumn("_ib", F.explode("_bs")).drop("_bs")
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return p.join(i, cond, how).drop("_pb", "_ib")


def _floordiv_expr(sql: str, width: int):
    """Exact floor division of an integral SQL expression: ``div``
    truncates toward zero, so subtract the non-negative ``pmod`` first to
    get a true floor (correct for negatives). ALL-integer arithmetic —
    no double ever enters, so it is exact over the full long range
    (a ``/`` would round past 2^53)."""
    c = f"CAST(({sql}) AS BIGINT)"
    return F.expr(f"(({c}) - pmod({c}, {width})) div {width}")


def point_in_interval_join_exact(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Integer-domain range join with EXACT bucket bounds — the epsilon-free
    variant of ``point_in_interval_join`` (whose ``hi - 1e-9`` upper-bucket
    nudge is correct for real-valued data but fragile at double-precision
    edges). For integral points/bounds the last bucket an interval
    [lo, hi) touches is exactly ``floor((hi-1)/w)``, computed in pure
    integer arithmetic (floor-division via pmod, correct for negatives),
    so no float ever enters the bucketing. Same scale shape: equi-join on
    bucket id, intervals spanning b buckets emit b rows; same in-join
    range predicate, so ``how='left'`` is a true left-outer join."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be a positive int, got {bucket_width}")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"how={how!r}: use 'inner' or 'left'")
    p = points.withColumn("_pb", _floordiv_expr(point_col, w))
    # empty intervals match nothing and would make F.sequence descend
    # (same guard as the real-valued variant)
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    i = (
        intervals.withColumn(
            "_bs",
            F.sequence(
                _floordiv_expr(lo_col, w),
                _floordiv_expr(f"({hi_col}) - 1", w),
            ),
        )
        .withColumn("_ib", F.explode("_bs"))
        .drop("_bs")
    )
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return p.join(i, cond, how).drop("_pb", "_ib")
