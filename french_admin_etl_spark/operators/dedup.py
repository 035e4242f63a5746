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


def dedup_max_seq_window(df: DataFrame, keys: list[str], seq_col: str = "lsn") -> DataFrame:
    """Window-ranking formulation (row_number desc == 1)."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
