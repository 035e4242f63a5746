"""J1/J2: dimension existence-probe joins and FK integrity checks.

Reference: the one join the reference actually performs is the
existence-probe against a dimension with null-out on miss —
``internal/infrastructure/repository/commune_repository.go:53-64`` looks up
each commune's EPCI key and nulls the FK when the EPCI row doesn't exist
(the strict variant that would instead abort is kept commented there).
The FK graph itself is enforced by the schema
(``migrations/000003_create_base_tables_ref_admin.up.sql:28,63-65``,
``migrations/000005_create_table_pop_commune.up.sql:43``); Spark has no
declarative FK, so ``fk_orphans`` is the assertable anti-join twin.

Scale design: dimensions are small by definition (regions/departements/
EPCI ≈ 10^2..10^4 rows) → ``broadcast`` both operators, so the fact table
never shuffles: the probe is a map-side hash join inside whole-stage
codegen, and at 100 TB the plan cost is exactly one scan of the fact.
For a dimension too large to broadcast, pass ``broadcast_dim=False`` and
the same plan becomes a shuffle hash join on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_validate(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    dim_key: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Existence-probe semi-join with null-out (J1).

    Returns ``fact`` with ``fk_col`` kept where a matching ``dim_key``
    exists in ``dim`` and NULLED where it doesn't — the reference's
    "commune without known EPCI keeps a NULL FK" semantics
    (``commune_repository.go:53-64``). Column set/order is unchanged.
    """
    key = dim_key or fk_col
    probe = dim.select(F.col(key).alias("__dim_key")).distinct()
    if broadcast_dim:
        probe = F.broadcast(probe)
    joined = fact.join(probe, fact[fk_col] == probe["__dim_key"], "left")
    return joined.select(
        *[
            F.when(F.col("__dim_key").isNotNull(), F.col(c)).alias(c)
            if c == fk_col
            else F.col(c)
            for c in fact.columns
        ]
    )


def fk_orphans(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    dim_key: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """FK anti-join (J2): rows of ``fact`` whose non-null ``fk_col`` has NO
    matching ``dim_key`` in ``dim`` — the assertable form of the reference's
    declarative FK constraints (``migrations/000003:28,63-65``). An e2e
    suite asserts this frame is empty after loading in FK-dependency order;
    a data-quality pipeline dead-letters it. NULL FKs are not orphans
    (SQL FK semantics: NULL references are legal unless NOT NULL)."""
    key = dim_key or fk_col
    probe = dim.select(F.col(key).alias(fk_col)).distinct()
    if broadcast_dim:
        probe = F.broadcast(probe)
    return fact.filter(F.col(fk_col).isNotNull()).join(probe, [fk_col], "left_anti")


def assert_fk(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    dim_key: str | None = None,
    sample: int = 5,
) -> None:
    """Hard FK assertion: raise with sample offenders if orphans exist.
    Driver-side cost is bounded: ``take(sample)`` short-circuits after the
    first non-empty partitions; the underlying anti-join is broadcast."""
    bad = fk_orphans(fact, dim, fk_col, dim_key).take(sample)
    if bad:
        raise AssertionError(
            f"FK violation: {fk_col} -> {dim_key or fk_col}; sample offenders: {bad}"
        )
