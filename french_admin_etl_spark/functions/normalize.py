"""Normalization / validating-cast column expressions (reference P4, F1-F6).

The reference's one non-trivial scalar transform
(``internal/infrastructure/entities/commune_population_princ.go:38-82``):
validate code-set membership, length guards, parse int year, normalize the
decimal comma, parse float, round-half-away to int; any failure drops the
row. Here each piece is a pure Column expression (JVM-side, codegen'd) so
Catalyst can fold/push them; the drop-on-error semantics live in
``operators.validate.validate_split``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_decimal(col: str | Column) -> Column:
    """F1+F2: ','→'.' then cast to double (commune_population_princ.go:66-68).

    try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast THROW
    on malformed input, but the reference's semantics are drop-on-error
    (ParseFloat error ⇒ skip row) — null-out and let validate_split reject."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").try_cast("double")


def parse_round_int(col: str | Column) -> Column:
    """F1-F3: normalize decimal separator, parse, round-half-up to int
    (commune_population_princ.go:66-73; math.Round on the non-negative
    domain == Spark HALF_UP round)."""
    return F.round(normalize_decimal(col)).try_cast("int")


def valid_code(col: str | Column, allowed: list[str] | None = None, length: int | None = None) -> Column:
    """F5+F6: set-membership and/or exact-length validity predicate
    (commune_population_princ.go:40-59)."""
    c = F.col(col) if isinstance(col, str) else col
    pred = F.lit(True)
    if allowed is not None:
        pred = pred & c.isin(allowed)
    if length is not None:
        pred = pred & (F.length(c) == length)
    return pred
