"""Vectorized content hashing.

The reference carries an opaque serialized geometry blob per row
(``internal/model/entities.go:28-42``) and verifies rows structurally; the
engine's per-row invariant is **content sha256 equality** (BASELINE.json
input_hint). Two implementations:

- ``content_sha``: JVM-side ``F.sha2(col, 256)`` — whole-stage-codegen'd,
  zero Python; the default in hot paths.
- ``sha256_udf``: Arrow-vectorized pandas UDF over ``hashlib`` — the
  input_hint-mandated vectorized-Python form; tested equal to ``F.sha2``.

Never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


_sha256_udf_cached = None


def sha256_udf(col):
    """Arrow-batched sha256 hex digest pandas UDF; None -> None.

    Constructed lazily (UDF registration needs a live session) from a local
    closure so cloudpickle serializes it BY VALUE — executors never need the
    package importable (works with or without spark-submit --py-files)."""
    global _sha256_udf_cached
    if _sha256_udf_cached is None:
        def _batch(s: pd.Series) -> pd.Series:
            import hashlib as _h
            return s.map(lambda v: _h.sha256(v.encode()).hexdigest() if v is not None else None)

        _sha256_udf_cached = F.pandas_udf(_batch, T.StringType())
    return _sha256_udf_cached(col)


def content_sha(col: str | Column, jvm: bool = True) -> Column:
    """sha256 hex of a string column. jvm=True uses codegen'd F.sha2."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256) if jvm else sha256_udf(c)
