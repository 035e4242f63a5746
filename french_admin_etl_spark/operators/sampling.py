"""Deterministic sampling & dataset splitting for training-data curation.

A 100-TB corpus pipeline needs samples and splits that are (a) stable
across reruns and cluster sizes, (b) derivable per-ROW with no global
state, and (c) leakage-free (a document's split never depends on which
batch delivered it). ``df.sample()`` fails (a): Spark's sampler is
seeded per-partition, so the selected set changes with partitioning.

Everything here keys off a **content-addressed uniform**: the first 8
hex chars of ``md5(seed || '|' || key)`` as a 32-bit uint mapped to
[0, 1). Same key + seed → same draw, on any engine — the DuckDB oracles
reproduce it verbatim, and a re-ingested duplicate lands in the same
split (no train/test leakage through redelivery). All expressions are
JVM-side (md5/conv/when): scan-speed, zero shuffle, trivially
whole-stage-codegen'd.

No direct reference analog (the reference loads reference data, it does
not curate corpora); the construction is the standard hash-mod split
idiom from large-scale dataset tooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def uniform_hash(cols: list[str], seed: str = "0") -> Column:
    """Deterministic per-row uniform in [0, 1) from the key columns.

    Each value is LENGTH-PREFIXED (``len:value``) before joining on
    ``|`` — a bare separator join is injectable: ('x|y', 'z') and
    ('x', 'y|z') would concatenate identically and always co-assign
    (review finding; the earlier null-sentinel fix covered NULLs but not
    the delimiter). Length prefixes make the encoding bijective with no
    escape-character corner cases, and both engines count characters the
    same way, so the DuckDB oracle twin is
    ``length(v)::VARCHAR || ':' || v``. Null key columns remain the
    explicit ``\\x00`` sentinel (``concat_ws`` SKIPS nulls, which would
    collapse ('x', NULL, 'y') and ('x', 'y', NULL) onto one draw)."""
    parts = [
        F.coalesce(
            F.concat(F.length(s).cast("string"), F.lit(":"), s),
            F.lit("\x00"),
        )
        for c in cols
        for s in (F.col(c).cast("string"),)
    ]
    key = F.concat_ws("|", F.lit(seed), *parts)
    u32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return u32 / F.lit(float(2**32))


def hash_sample(
    df: DataFrame, cols: list[str], fraction: float, seed: str = "0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key."""
    return df.filter(uniform_hash(cols, seed) < F.lit(fraction))


def split_assign(
    df: DataFrame,
    cols: list[str],
    weights: dict[str, float],
    seed: str = "0",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by cumulative weight thresholds
    (e.g. {'train': .8, 'val': .1, 'test': .1}); weights must sum to 1.
    Duplicate keys always land in the same split — the leakage guard."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = uniform_hash(cols, seed)
    names = list(weights)
    expr = F.lit(names[-1])  # last bucket takes the remainder exactly
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name]
        cases.append((acc, name))
    for bound, name in reversed(cases):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fractions: dict,
    key_cols: list[str],
    seed: str = "0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum (e.g. language) →
    fraction. One scan, no shuffle — the per-stratum threshold is a
    broadcast-sized CASE over the strata values (corpus curation has
    dozens of strata, not millions). Strata absent from ``fractions``
    fall back to ``default_fraction`` (0 = drop, the usual curation
    default for unvetted languages/sources)."""
    # match with TYPED literals per column (null-safe), never stringified
    # Python values: str(True) is 'True' but Spark casts the column to
    # 'true', so a string-rendered match silently sends boolean/typed
    # strata to default_fraction (reviewer finding)
    thr = F.lit(float(default_fraction))
    for stratum, frac in fractions.items():
        key = stratum if isinstance(stratum, tuple) else (stratum,)
        if len(key) != len(strata_cols):
            raise ValueError(
                f"stratum {stratum!r} has {len(key)} values for "
                f"{len(strata_cols)} strata columns"
            )
        match = F.lit(True)
        for c, v in zip(strata_cols, key):
            match = match & F.col(c).eqNullSafe(F.lit(v))
        thr = F.when(match, F.lit(float(frac))).otherwise(thr)
    return df.filter(uniform_hash(key_cols, seed) < thr)


def stratified_quota(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    key_cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """EXACTLY ``quota`` rows per stratum (fewer if the stratum is
    smaller), chosen as the lowest hash draws — deterministic and
    incrementally stable (a new row only displaces the current max draw).
    One shuffle by stratum; rank, don't sort globally. For skew-free
    scale, prefer ``stratified_sample`` when an approximate rate is
    acceptable — exact quotas fundamentally need the per-stratum rank."""
    w = Window.partitionBy(*strata_cols).orderBy(
        uniform_hash(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )
