"""Hot-key detection + salting for the apply stage (north_rule).

The reference's hash map distributes keys implicitly; at cluster scale a
Zipf-hot repo concentrates a shuffle partition. AQE handles *join* skew but
not groupBy/write hot keys, so the engine salts explicitly:

- ``hot_keys``: sampled frequency count → keys above a threshold share.
- ``add_salt``: uniform salt column ``pmod(xxhash64(seq), n_salts)`` for
  two-phase aggregation (salted partial → final), used by the dedup and
  lineage stages when a batch is skewed.

Note ``operators.dedup.dedup_max_seq`` is already map-side-combining, so
salting is only needed for non-algebraic per-key work (e.g. collecting a
key's full history); it is exposed as a first-class primitive regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    keys: list[str],
    sample_fraction: float = 0.05,
    min_share: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Sampled per-key counts; returns keys whose sampled share ≥ min_share.

    ONE scan of the sample: the grouped counts are materialized
    (localCheckpoint) and the total derived by summing them — the
    earlier separate ``s.count()`` re-scanned the whole source applying
    the sampler a second time, and silently relied on ``sample(seed=)``
    re-evaluating identically across the two jobs (review finding).
    """
    s = df.sample(fraction=sample_fraction, seed=seed)
    grouped = (
        s.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n")).localCheckpoint(eager=True)
    )
    total = (grouped.agg(F.sum("_n")).collect()[0][0] or 0) or 1
    return (
        grouped.filter(F.col("_n") >= min_share * total)
        .select(*keys, (F.col("_n") / F.lit(total)).alias("sampled_share"))
    )


def add_salt(df: DataFrame, n_salts: int, entropy_col: str = "lsn", out_col: str = "_salt") -> DataFrame:
    """Deterministic uniform salt derived from an existing high-entropy
    column (no rand(): replays must produce identical partitioning)."""
    return df.withColumn(out_col, F.pmod(F.xxhash64(F.col(entropy_col)), F.lit(n_salts)).cast("int"))
