"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(implemented in ``french_admin_etl_spark``) against the driver's tables;
``oracle_sql()`` holds the DuckDB-checkable twin. Column names are aliased
identically on both sides (the driver hashes values under sorted column
names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from french_admin_etl_spark.operators.dedup import dedup_max_seq
from french_admin_etl_spark.operators.filters import allow_list_filter
from french_admin_etl_spark.operators.pivot import pivot_last_write_wins

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------- queries


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-family flagship aggregation (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def p1_allowlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: conjunctive allow-list filter, pushed into the scan."""
    ev = _t(spark, sf_dir, "events")
    return allow_list_filter(ev, {"event_type": ["click", "purchase"]}).filter(
        F.col("value") > 50
    ).select("event_id", "user_id", "event_type", "value")


def p4_validating_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/F1-F6: validating/coercing map — JSON prop extract, try_cast,
    round-half-up, validity split (invalid rows dropped)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.select(
            "event_id",
            k.alias("k_int"),
            F.round(F.col("value")).try_cast("int").alias("value_round"),
        )
        .filter(F.col("k_int").isNotNull() & (F.col("k_int") >= 0))
    )


def a1_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: long→wide pivot per user with lineage count (33-cell scatter
    analog, commune_population_repository.go:68-170)."""
    ev = _t(spark, sf_dir, "events")
    out = pivot_last_write_wins(
        ev, ["user_id"], "event_type", EVENT_TYPES, "value", seq_col="event_id"
    )
    return out.select(
        "user_id",
        F.col("click").alias("last_click_value"),
        F.col("error").alias("last_error_value"),
        F.col("purchase").alias("last_purchase_value"),
        F.col("signup").alias("last_signup_value"),
        F.col("view").alias("last_view_value"),
        F.col("entity_count"),
    )


def w1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: max-sequence dedup per key (north_rule core)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    return dedup_max_seq(ev, ["user_id"], "event_id")


def j1_dim_validation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: existence-probe semi-join with null-out fallback
    (commune_repository.go:53-64) as a broadcast left join."""
    orders = _t(spark, sf_dir, "orders")
    rich = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000).select("c_custkey")
    return orders.join(F.broadcast(rich), orders.o_custkey == rich.c_custkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("c_custkey").isNotNull(), F.col("o_custkey")).alias("validated_custkey"),
    )


def s7_coalesce_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: partial-column COALESCE merge of two keyed snapshots
    (ON CONFLICT DO UPDATE SET c = COALESCE(EXCLUDED.c, t.c))."""
    ev = _t(spark, sf_dir, "events")
    old = (
        ev.filter(F.col("event_id") < 5000)
        .groupBy("user_id")
        .agg(F.max_by("value", "event_id").alias("v_old"))
    )
    new = (
        ev.filter((F.col("event_id") >= 5000) & (F.col("event_type") == "purchase"))
        .groupBy("user_id")
        .agg(F.max_by("value", "event_id").alias("v_new"))
    )
    return (
        old.join(new, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("v_new", "v_old").alias("merged_value"),
            F.col("v_new").isNotNull().alias("updated"),
        )
    )


def o1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-family deterministic ordering: top-5 orders per priority by
    totalprice (tie-broken by key)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's MERGE semantics as a query: replay events keyed by
    user_id (event_id = LSN, event_type 'error' = delete); final state =
    max-LSN winner per key, dropped if the winner is a delete."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    last = dedup_max_seq(ev, ["user_id"], "event_id")
    return last.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def a2_lineage_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W2: per-key lineage counters + LSN range (entityCount analog)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("lsn_min"),
        F.max("event_id").alias("lsn_max"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_deletes"),
    )


def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token count + char length per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(r"size(regexp_extract_all(text, '\\S+', 0))").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality: alpha ratio, space ratio, mean token length."""
    docs = _t(spark, sf_dir, "documents")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace("text", "[^ ]", ""))
    n_tok = F.expr(r"size(regexp_extract_all(text, '\\S+', 0))")
    return docs.select(
        "doc_id",
        F.round(n_alpha / F.greatest(F.length("text"), F.lit(1)), 4).alias("alpha_ratio"),
        F.round(n_space / F.greatest(F.length("text"), F.lit(1)), 4).alias("space_ratio"),
        F.round((F.length("text") - n_space) / F.greatest(n_tok, F.lit(1)), 4).alias(
            "mean_token_len"
        ),
    )


def t3_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content: canonical doc per distinct text + dup count."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("canonical_doc_id", "n_copies")


def t5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def e1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine top-10 to the vec_id=0 query
    vector. Baseline ANN path; JVM-side fold over the array (no Python)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    dot = F.aggregate(
        F.zip_with(dbl("embedding"), dbl("q_emb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(dbl(c), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    sim = dot / (norm("embedding") * norm("q_emb"))
    return (
        joined.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cos_sim", 4).alias("cos_sim_r"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the engine's CDC final-state semantics at sf0.001."""
    return cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "p1_allowlist_filter": p1_allowlist_filter,
        "p4_validating_cast": p4_validating_cast,
        "a1_pivot_counts": a1_pivot_counts,
        "w1_dedup_latest": w1_dedup_latest,
        "j1_dim_validation_join": j1_dim_validation_join,
        "s7_coalesce_merge": s7_coalesce_merge,
        "o1_topk_per_group": o1_topk_per_group,
        "cdc_final_state": cdc_final_state,
        "a2_lineage_ranges": a2_lineage_ranges,
        "t1_token_stats": t1_token_stats,
        "t2_quality_score": t2_quality_score,
        "t3_exact_dedup": t3_exact_dedup,
        "t5_fingerprint": t5_fingerprint,
        "e1_knn_bruteforce": e1_knn_bruteforce,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
                   avg(l_quantity) AS avg_qty,
                   avg(l_extendedprice) AS avg_price,
                   avg(l_discount) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "p1_allowlist_filter": """
            SELECT event_id, user_id, event_type, value
            FROM events
            WHERE event_type IN ('click', 'purchase') AND value > 50
        """,
        "p4_validating_cast": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                   CAST(round(value) AS INTEGER) AS value_round
            FROM events
            WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
              AND CAST(json_extract_string(props, '$.k') AS INTEGER) >= 0
        """,
        "a1_pivot_counts": """
            SELECT user_id,
                   arg_max(CASE WHEN event_type='click' THEN value END,
                           CASE WHEN event_type='click' THEN event_id END) AS last_click_value,
                   arg_max(CASE WHEN event_type='error' THEN value END,
                           CASE WHEN event_type='error' THEN event_id END) AS last_error_value,
                   arg_max(CASE WHEN event_type='purchase' THEN value END,
                           CASE WHEN event_type='purchase' THEN event_id END) AS last_purchase_value,
                   arg_max(CASE WHEN event_type='signup' THEN value END,
                           CASE WHEN event_type='signup' THEN event_id END) AS last_signup_value,
                   arg_max(CASE WHEN event_type='view' THEN value END,
                           CASE WHEN event_type='view' THEN event_id END) AS last_view_value,
                   count(*) AS entity_count
            FROM events GROUP BY user_id
        """,
        "w1_dedup_latest": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT user_id, event_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "j1_dim_validation_join": """
            SELECT o.o_orderkey, o.o_totalprice,
                   CASE WHEN c.c_custkey IS NOT NULL THEN o.o_custkey END AS validated_custkey
            FROM orders o
            LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000) c
              ON o.o_custkey = c.c_custkey
        """,
        "s7_coalesce_merge": """
            WITH old AS (
              SELECT user_id, arg_max(value, event_id) AS v_old
              FROM events WHERE event_id < 5000 GROUP BY user_id
            ), new AS (
              SELECT user_id, arg_max(value, event_id) AS v_new
              FROM events WHERE event_id >= 5000 AND event_type = 'purchase' GROUP BY user_id
            )
            SELECT coalesce(old.user_id, new.user_id) AS user_id,
                   coalesce(v_new, v_old) AS merged_value,
                   (v_new IS NOT NULL) AS updated
            FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
        """,
        "o1_topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders
            ) WHERE rk <= 5
        """,
        "cdc_final_state": """
            SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                   value AS last_value
            FROM (
              SELECT user_id, event_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1 AND event_type <> 'error'
        """,
        "a2_lineage_ranges": """
            SELECT user_id, count(*) AS n_events,
                   min(event_id) AS lsn_min, max(event_id) AS lsn_max,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_deletes
            FROM events GROUP BY user_id
        """,
        "t1_token_stats": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "t2_quality_score": r"""
            SELECT doc_id,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / greatest(length(text), 1), 4) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^ ]', '', 'g'))
                         / greatest(length(text), 1), 4) AS space_ratio,
                   round((length(text) - length(regexp_replace(text, '[^ ]', '', 'g')))
                         / greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS mean_token_len
            FROM documents
        """,
        "t3_exact_dedup": """
            SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "t5_fingerprint": r"""
            SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
            FROM documents
        """,
        "e1_knn_bruteforce": """
            WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
            pairs AS (
              SELECT e.vec_id,
                     unnest(e.embedding)::DOUBLE AS x,
                     unnest(q.q_emb)::DOUBLE AS y
              FROM embeddings e, q WHERE e.vec_id <> 0
            ),
            sims AS (
              SELECT vec_id,
                     sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos_sim
              FROM pairs GROUP BY vec_id
            )
            SELECT vec_id, round(cos_sim, 4) AS cos_sim_r
            FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
    }
