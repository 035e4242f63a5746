"""Approximate-nearest-neighbor search over embedding columns.

Two paths, both pure DataFrame ops (JVM-side array folds — no Python in
the hot path):

- ``cosine_topk``: brute-force exact baseline. Broadcast the query
  vector(s), fold the dot product with ``zip_with``/``aggregate``, global
  top-k. O(N·d) per query — correct at any scale but reads the whole
  corpus; use for verification and for small/filtered candidate sets.
- ``signature_bucket_ann``: the scale path. Every vector gets a coarse
  bucket id from the sign pattern of its first ``bits`` components (a
  deterministic, data-independent hyperplane LSH — the axis-aligned
  special case). Search probes only the query's bucket (plus optional
  1-bit-flip neighbor buckets), so a 10^10-vector corpus is pruned by
  ~2^bits before any distance math. Bucket ids are computable in plain
  SQL (oracle-checkable) and partition-prunable when the table is written
  partitioned/bucketed by ``bucket``.

At cluster scale: write the embedding table bucketed by the signature →
each query touches ``multiplicity`` buckets → scan pruning does the work;
the per-bucket top-k is a tiny sort. Skew: sign-buckets over centered
embeddings are near-balanced; a hot bucket degrades to a larger scan, not
a failed job (cap with LIMIT on the candidate set if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k of ``corpus`` against one query row
    (columns ``q_id``, ``q_emb``). Query side is broadcast; corpus scan is
    embarrassingly parallel; the final top-k is a k-row sort."""
    joined = corpus.crossJoin(F.broadcast(query))
    return (
        joined.select(
            F.col("q_id"),
            F.col(id_col),
            cosine(F.col(vec_col), F.col("q_emb")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def sign_bucket(vec_col: str | Column, bits: int = 8) -> Column:
    """Coarse LSH bucket: bit i set iff component i > 0 (axis-aligned
    hyperplane signs). Deterministic, SQL-expressible, partition-prunable."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(v, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("int")


def signature_bucket_ann(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    probe_flips: int = 0,
) -> DataFrame:
    """ANN via sign-bucket pruning: score only corpus vectors whose bucket
    matches the query's (optionally also buckets at hamming distance 1 —
    ``probe_flips`` of them — to trade recall for scan size)."""
    c = corpus.withColumn("_bucket", sign_bucket(vec_col, bits))
    q = query.withColumn("_qbucket", sign_bucket("q_emb", bits))
    if probe_flips:
        probes = F.array(
            F.col("_qbucket"),
            *[F.col("_qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(probe_flips)],
        )
        q = q.withColumn("_probe", F.explode(probes)).drop("_qbucket")
        cond = c["_bucket"] == q["_probe"]
    else:
        cond = c["_bucket"] == q["_qbucket"]
    joined = c.join(F.broadcast(q), cond)
    return (
        joined.select(
            F.col("q_id"),
            F.col(id_col),
            cosine(F.col(vec_col), F.col("q_emb")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs: candidate pairs share a sign-bucket
    (blocking), then exact cosine ≥ threshold. The bucket join replaces the
    quadratic cross-join — at 10^10 rows the all-pairs form is impossible;
    this form shuffles each row once by bucket."""
    b = df.withColumn("_bucket", sign_bucket(vec_col, bits))
    a = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_bucket")
    c = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_bucket")
    return (
        a.join(c, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
