"""P5/S9: validate-and-split (drop-on-error → dead-letter, batch survives).

The reference isolates bad rows two ways: the mapper returns error/nil and
the transformer skips that row (``internal/transformers/csv_transformer.go:
17-33``), and the sink wraps each row in a savepoint so one bad row doesn't
poison the transaction (``region_repository.go:55-84``). Spark has no
per-row rollback inside a commit, so the engine quarantines *before* the
write: one pass tags each row with its first failing rule, then splits into
(valid, rejects-with-reason). Both halves come from the same cached plan —
no double scan of the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_split(
    df: DataFrame, rules: dict[str, Column], cache: bool = False
) -> tuple[DataFrame, DataFrame]:
    """rules: {reason: predicate-that-must-hold}. Returns (valid, rejects).

    rejects carries a ``_reject_reason`` column (first failing rule, in
    rule order — mirrors the reference's logged per-row error).

    ``cache=True`` persists the tagged frame so consuming BOTH halves costs
    one source scan — but the cache is never auto-unpersisted, so callers
    in long-running drivers must ``.unpersist()`` one of the returned
    frames themselves (default False: the engine's own apply path caches
    the upstream batch instead, ``streaming/apply.py``).
    """
    reason = F.lit(None).cast("string")
    for name, pred in reversed(list(rules.items())):
        reason = F.when(~pred | pred.isNull(), F.lit(name)).otherwise(reason)
    tagged = df.withColumn("_reject_reason", reason)
    if cache:
        tagged = tagged.cache()
    valid = tagged.filter(F.col("_reject_reason").isNull()).drop("_reject_reason")
    rejects = tagged.filter(F.col("_reject_reason").isNotNull())
    return valid, rejects
