"""W1: max-sequence dedup per natural key.

The reference achieves last-write-wins operationally: the pivot map
overwrites per key within a batch
(``commune_population_repository.go:157-170``) and the keyed upsert makes
redelivery idempotent (``region_repository.go:38-42``). The engine makes it
explicit: per (key...), keep the row with the greatest sequence number (LSN).

Two physical strategies, same semantics:

- ``dedup_max_seq`` (default): ``groupBy(keys).agg(max_by(struct(*), seq))``.
  **Map-side partial aggregation**, so a hot key with millions of
  duplicates in one batch is reduced locally on every task before the
  shuffle (≤ one row per key per map task crosses the wire) — inherently
  skew-resistant; this is the 100-TB path. Physical note: Spark compiles
  struct-valued ``max_by`` to SortAggregate (struct agg buffers aren't
  mutable-hash-able), but the partial/final split and single Exchange are
  what matter at scale — verified by ``tools/explain_audit.py``.
- ``dedup_max_seq_window``: ``row_number() over (partition by keys order by
  seq desc) = 1``. One full shuffle + sort per key; all rows of a key land
  on one task (skew-prone). Kept for plan comparison and as the
  SQL-oracle-friendly formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_max_seq(df: DataFrame, keys: list[str], seq_col: str = "lsn") -> DataFrame:
    """Keep, per key, the row with max(seq_col). Columns/order preserved.

    Ties on seq (exact duplicate redelivery) carry identical payloads, so
    either winner is correct; max_by over a struct ordered by (seq) is
    deterministic for distinct seqs.
    """
    cols = df.columns
    payload = F.struct(*[F.col(c) for c in cols])
    agg = df.groupBy(*keys).agg(F.max_by(payload, F.col(seq_col)).alias("_row"))
    return agg.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def dedup_coalesce(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "lsn",
    op_col: str = "op",
    data_cols: list[str] | None = None,
) -> DataFrame:
    """Coalesce-aware intra-batch fold: per key, each column keeps its LAST
    NON-NULL value in LSN order — the per-event semantics of the
    reference's ``ON CONFLICT DO UPDATE SET c = COALESCE(EXCLUDED.c, t.c)``
    (``commune_population_repository.go:201-264``) applied to a whole
    micro-batch at once. ``dedup_max_seq`` would keep only the max-LSN
    ROW, silently dropping columns set by earlier partial updates in the
    same batch.

    Delete barriers: a 'D' event discards everything before it — a column
    survives only if its last non-null assignment came AFTER the last
    delete. If the batch's final event for a key is the delete itself, the
    fold emits a single 'D' row (all data columns null). When events
    SURVIVE past an intra-batch delete, the output row additionally
    carries ``_del_lsn`` = the delete high-water mark (null otherwise):
    the fold cannot express "this null column was CLEARED by the delete"
    in the value alone, and without the marker the merge would coalesce
    those nulls against PRE-delete state from earlier batches —
    resurrecting deleted values (found by live repro in review). The
    merge modes consume ``_del_lsn``; it never reaches the table.

    ONE groupBy of combinable aggregates (per column:
    ``max_by(struct(seq, c), seq) FILTER (c IS NOT NULL)``, plus the
    delete high-water mark) — map-side partial agg, skew-proof, no second
    pass: the barrier comparison happens in the post-projection. Output
    columns/order match the input plus ``_del_lsn``; ``seq_col`` carries
    max(seq) and ``op_col`` is 'D' or 'U'."""
    cols = df.columns
    if data_cols is None:
        data_cols = [c for c in cols if c not in keys and c not in (seq_col, op_col)]
    seq = F.col(seq_col)
    is_del = F.col(op_col) == F.lit("D")
    aggs = [
        F.max(seq).alias("_smax"),
        F.max(F.when(is_del, seq)).alias("_dmax"),
    ]
    for c in data_cols:
        # last non-null assignment: (seq, value) at the greatest seq where
        # the event set the column (delete rows carry nulls upstream, so
        # they never count as assignments)
        aggs.append(
            F.max_by(
                F.struct(seq.alias("s"), F.col(c).alias("v")),
                F.when(F.col(c).isNotNull() & ~is_del, seq),
            ).alias(f"_l_{c}")
        )
    agg = df.groupBy(*keys).agg(*aggs)
    survived = F.col("_dmax").isNull() | (F.col("_smax") > F.col("_dmax"))
    out = []
    for c in cols:
        if c in keys:
            out.append(F.col(c))
        elif c == seq_col:
            out.append(F.col("_smax").alias(seq_col))
        elif c == op_col:
            out.append(F.when(survived, F.lit("U")).otherwise(F.lit("D")).alias(op_col))
        else:
            last = F.col(f"_l_{c}")
            keep = last.isNotNull() & (
                F.col("_dmax").isNull() | (last["s"] > F.col("_dmax"))
            )
            out.append(F.when(survived & keep, last["v"]).alias(c))
    out.append(F.when(survived, F.col("_dmax")).alias("_del_lsn"))
    return agg.select(*out)


def dedup_max_seq_window(df: DataFrame, keys: list[str], seq_col: str = "lsn") -> DataFrame:
    """Window-ranking formulation (row_number desc == 1)."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
