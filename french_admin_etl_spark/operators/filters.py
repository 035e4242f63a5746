"""P1/P2: allow-list conjunctive filter.

Reference: ``internal/Filters/CsvRecordFilter.go:22-39`` — AND across
columns, IN within a column, missing column rejects, empty allow-list
accepts all, case-sensitive. Expressed as a single boolean Column so
Catalyst pushes it into the scan (the reference hand-places it inside the
parse loop, ``csv_extractor.go:92-95``; here pushdown is free).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def allow_list_predicate(allow: dict[str, list[str]]) -> Column:
    """Conjunction of col.isin(values); empty dict ⇒ accept all."""
    if not allow:
        return F.lit(True)
    preds = [F.col(c).isin(vals) for c, vals in allow.items()]
    return reduce(lambda a, b: a & b, preds)


def allow_list_filter(df: DataFrame, allow: dict[str, list[str]]) -> DataFrame:
    """Missing column ⇒ reject all rows for that predicate (reference
    semantics: a record without the filtered column never passes)."""
    for c in allow:
        if c not in df.columns:
            return df.filter(F.lit(False))
    return df.filter(allow_list_predicate(allow))
