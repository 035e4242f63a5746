"""A1/A2: hash group-by + long→wide pivot with last-write-wins.

Reference: ``commune_population_repository.go:68-170`` — group 5-col long
rows by (codeCommune, annee), scatter each (AGE, SEX) pair into one of 33
wide columns, last write wins within the batch, plus an entityCount lineage
counter. Spark-first: order is made explicit with a sequence column and
``max_by`` (the reference relies on map-insertion order), and the pivot is
a fixed list of deterministic agg expressions so the plan is a single
partial+final hash aggregate — no second pivot pass, no distinct-values job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_last_write_wins(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    seq_col: str | None = None,
    count_alias: str = "entity_count",
) -> DataFrame:
    """One wide row per group; cell (g, v) = value of the last row (by
    seq_col; arbitrary-but-last-wins if None, matching the reference's
    in-batch overwrite) whose pivot_col == v.

    Both modes share one null semantic: the chosen MATCHING ROW's value
    wins even when that value is NULL. The seq-less arm wraps the cell
    in a struct so ``last(ignorenulls=True)`` skips only NON-MATCHING
    rows, not matching rows that happen to carry a null value — a bare
    ``last(cell, ignorenulls=True)`` silently resurrected the previous
    non-null write, diverging from the seq mode's max_by (review
    finding)."""
    aggs = []
    for v in pivot_values:
        cell = F.when(F.col(pivot_col) == v, F.col(value_col))
        if seq_col is not None:
            aggs.append(
                F.max_by(cell, F.when(F.col(pivot_col) == v, F.col(seq_col))).alias(v)
            )
        else:
            aggs.append(
                F.last(
                    F.when(
                        F.col(pivot_col) == v,
                        F.struct(F.col(value_col).alias("v")),
                    ),
                    ignorenulls=True,
                )["v"].alias(v)
            )
    aggs.append(F.count(F.lit(1)).alias(count_alias))
    return df.groupBy(*group_cols).agg(*aggs)
