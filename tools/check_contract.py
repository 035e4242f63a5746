"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count, column names, and order-insensitive values.

Values are compared exactly AND with 1e-9 relative tolerance, so
floating-aggregation-order differences show up as NEAR (risk) rather
than hiding inside PASS.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from french_admin_etl_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    # TYPE-FAITHFUL: int vs float (and bool vs int) must NOT compare equal —
    # the driver's pandas-side hash distinguishes them (a DuckDB HUGEINT
    # rendered as 13.0 vs Spark's long 13 is a real hash mismatch; this gate
    # must predict it rather than hide behind Python's 13 == 13.0). Both
    # result sets therefore go THROUGH pandas (like the driver's compare),
    # and numpy scalars are unwrapped before typing.
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", float(f"{v:.9g}"))
    if isinstance(v, int):
        return ("int", v)
    if hasattr(v, "isoformat"):
        # DuckDB .df() renders DATE as midnight Timestamp; Spark toPandas
        # keeps datetime.date — same driver-side value, so normalize
        iso = v.isoformat()
        return iso[:-9] if iso.endswith("T00:00:00") else iso
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(canon(x) for x in v)
    return v


def rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    spark = get_spark(app_name="contract_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # the driver checks queries(); locally we ALSO hash-check the pairs
    # consolidated out of the 50-entry contract (extra_queries)
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()  # pandas path = what the driver hashes
            s_cols = list(s_pdf.columns)
            s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only check) rows={len(s_rows)}")
            continue
        try:
            d_pdf = con.execute(oracles[name]).df()
            d_cols = list(d_pdf.columns)
            d_rows = [tuple(r) for r in d_pdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            ss = rows_to_set(s_rows, s_cols)
            ds = rows_to_set(d_rows, d_cols)
            if ss != ds:
                diff = [(a, b) for a, b in zip(ss, ds) if a != b][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS  {name} rows={len(s_rows)}")
        else:
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(only=sys.argv[1:] or None) else 0)
