"""Physical-plan audit: print `.explain(formatted)` for the engine's hot
paths and assert the plan properties that matter at 100 TB:

- filters reach the parquet scan (PushedFilters) and columns are pruned
  (ReadSchema) — Catalyst pushdown working through our operators;
- the W1 dedup compiles to hash aggregation with partial (map-side)
  aggregation, not a window sort;
- the MERGE-source pipeline stays inside WholeStageCodegen (no Python
  in the hot path with JVM sha);
- the dimension-validation join broadcasts the small side.

Run: python tools/explain_audit.py [sf_dir]   (writes PLANS.md)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from french_admin_etl_spark.functions.hashing import content_sha
from french_admin_etl_spark.operators.dedup import dedup_max_seq
from french_admin_etl_spark.session import get_spark

CHECKS = []


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must_contain: list[str], must_not: list[str] = ()):
    ok = all(s in plan for s in must_contain) and not any(s in plan for s in must_not)
    CHECKS.append((name, ok, must_contain, list(must_not)))
    return ok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain_audit", cores=8, shuffle_partitions=8)
    sections = []

    # 1. pushdown + pruning through the allow-list filter operator
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    q = ev.filter(F.col("event_type").isin("click", "purchase")).select("event_id", "value")
    p = plan_of(q)
    check("filter pushdown + column pruning", p, ["PushedFilters: [In(event_type", "ReadSchema"])
    sections.append(("Allow-list filter scan (P1/P2)", p))

    # 2. W1 dedup: partial (map-side) max_by BEFORE the exchange, one
    #    shuffle, no Window. (Spark picks SortAggregate for struct-valued
    #    max_by buffers — the skew-critical property is the partial agg,
    #    which bounds per-key rows crossing the shuffle to #map-tasks.)
    d = dedup_max_seq(ev.select("user_id", "event_id", "value"), ["user_id"], "event_id")
    p = plan_of(d)
    partial_first = (
        "partial_max_by" in p and "Exchange" in p
        and p.index("partial_max_by") < p.index("(4) Exchange" if "(4) Exchange" in p else "Exchange")
    )
    check("dedup partial-aggregates map-side before its single shuffle", p,
          ["partial_max_by"], ["Window"])
    CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and partial_first and p.count("Exchange") <= 2,
                  CHECKS[-1][2], CHECKS[-1][3])
    sections.append(("W1 max-LSN dedup (map-side combine, skew-resistant)", p))

    # 3. MERGE-source normalize+sha+dedup: all JVM, whole-stage codegen
    src = ev.select("user_id", "event_id",
                    content_sha(F.col("event_type")).alias("sha"))
    d2 = dedup_max_seq(src, ["user_id"], "event_id")
    p = plan_of(d2)
    check("merge source stays JVM-side (sha2 inlined, no Python eval)", p,
          ["sha2("], ["BatchEvalPython", "ArrowEvalPython", "PythonUDF"])
    sections.append(("MERGE source: normalize + sha2 + dedup", p))

    # 4. dim-validation join broadcasts the small side
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    rich = cust.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    j = orders.join(F.broadcast(rich), orders.o_custkey == rich.c_custkey, "left")
    p = plan_of(j)
    check("dim validation join broadcasts", p, ["BroadcastHashJoin"], ["SortMergeJoin"])
    sections.append(("J1 dim-validation broadcast join", p))

    # 5. J1/J2 operators: broadcast probe, no sort-merge, anti-join shape
    from french_admin_etl_spark.operators.dim_join import fk_orphans, fk_validate

    p = plan_of(fk_validate(orders.select("o_orderkey", "o_custkey"), rich,
                            "o_custkey", "c_custkey"))
    check("fk_validate broadcasts the dimension probe", p,
          ["BroadcastHashJoin"], ["SortMergeJoin"])
    sections.append(("J1 fk_validate (broadcast existence probe + null-out)", p))

    p = plan_of(fk_orphans(orders.select("o_orderkey", "o_custkey"), rich,
                           "o_custkey", "c_custkey"))
    check("fk_orphans is a broadcast anti-join", p,
          ["BroadcastHashJoin", "LeftAnti"], ["SortMergeJoin"])
    sections.append(("J2 fk_orphans (broadcast left_anti)", p))

    # 6. LSH banding is single-pass: the banded frame is computed once
    #    (cached) and re-read, not re-derived per consumer
    from french_admin_etl_spark.operators.textdedup import (
        lsh_candidate_pairs, minhash_signature,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sig = minhash_signature(docs, "doc_id", "text", num_hashes=16, shingle_n=3)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=4)
    p = plan_of(pairs)
    # banded is a bounded persist (round-5 review: one outstanding cache,
    # retired when a different corpus arrives) — consumers scan the
    # columnar cache instead of re-deriving the explode per consumer
    check("LSH banding computed once, consumers read the cache", p,
          ["InMemoryTableScan"])
    sections.append(("LSH banding (single-pass explode, cached fan-out)", p))

    # 7. IVF assignment: broadcast nested-loop over k centroids — one
    #    corpus scan, no shuffle of the corpus side before assignment
    from french_admin_etl_spark.operators.similarity import ivf_assign, ivf_train

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = ivf_train(emb, k_lists=8)
    p = plan_of(ivf_assign(emb, cents))
    check("IVF assignment broadcasts centroids (no corpus-side shuffle join)", p,
          ["BroadcastNestedLoopJoin"], ["CartesianProduct", "SortMergeJoin"])
    sections.append(("IVF assign (broadcast argmax over k centroids)", p))

    # 8. content-defined chunking: per-row array lambdas only — the chunk
    #    stream reaches shared_chunks' single groupBy with ONE exchange and
    #    partial (map-side) aggregation; zero Python anywhere
    from french_admin_etl_spark.operators.textdedup import shared_chunks

    p = plan_of(shared_chunks(docs, "doc_id", "text", mod=32))
    # countDistinct plans as TWO hash-agg phases (distinct expand + final)
    # → 2 shuffles, each map-side partial; anything beyond that (a join, a
    # window, Python) would show as extra exchanges/operators
    chunk_ok = p.count("Exchange (") <= 2 and "HashAggregate" in p
    check("CDC chunking: row-local lambdas, combinable agg shuffles only", p,
          ["partial_count"], ["BatchEvalPython", "ArrowEvalPython", "Window", "Join"])
    CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and chunk_ok, CHECKS[-1][2], CHECKS[-1][3])
    sections.append(("Sub-document dedup: content-defined chunks → shared_chunks", p))

    # 9. dedup_coalesce (S7 intra-batch fold): ONE hash/sort aggregate with
    #    map-side partials, no Window, single exchange
    from french_admin_etl_spark.operators.dedup import dedup_coalesce

    src8 = ev.select(
        "user_id", F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("v"),
    )
    p = plan_of(dedup_coalesce(src8, ["user_id"], "lsn", "op"))
    check("dedup_coalesce: single combinable aggregation, no window", p,
          ["partial_max"], ["Window", "BatchEvalPython"])
    CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and p.count("Exchange") <= 2,
                  CHECKS[-1][2], CHECKS[-1][3])
    sections.append(("S7 dedup_coalesce (per-column last-non-null fold)", p))

    # 10. MOR coalesce read resolution: still ONE groupBy (per-column
    #     conditional max_by), never a per-column self-join or window
    import tempfile

    from pyspark.sql import types as T

    from french_admin_etl_spark.table.lake_table import LakeTable

    with tempfile.TemporaryDirectory(prefix="audit_mor_") as td:
        t = LakeTable.create(
            spark, os.path.join(td, "t"),
            T.StructType([T.StructField("k", T.StringType()),
                          T.StructField("a", T.StringType()),
                          T.StructField("b", T.StringType())]),
            ["k"], num_buckets=2, write_mode="mor",
        )
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "k string, a string, b string, lsn long, op string"
        )
        t.merge(mk([("x", "1", "2", 1, "I")]), batch_id=0, mode="coalesce")
        t.merge(mk([("x", None, "3", 2, "U")]), batch_id=1, mode="coalesce")
        p = plan_of(t.read())
        check("MOR coalesce resolution is one aggregate (no join/window)", p,
              ["max_by"], ["Window", "SortMergeJoin", "BroadcastHashJoin"])
        sections.append(("MOR partial-column (coalesce) read resolution", p))

    # 11. exact integer range join: bucket equi-join, never a cross product
    from french_admin_etl_spark.operators.asof import point_in_interval_join_exact

    pts = ev.select("event_id")
    ivs = spark.range(50).select((F.col("id") * 100).alias("lo"),
                                 (F.col("id") * 100 + 150).alias("hi"))
    p = plan_of(point_in_interval_join_exact(pts, ivs, "event_id", "lo", "hi", 64))
    check("exact range join is an equi-join on buckets", p, ["Join"],
          ["CartesianProduct", "BroadcastNestedLoopJoin"])
    sections.append(("Exact integer range join (bucket equi-join)", p))

    # 12. sampling / split assignment: pure scan-speed expressions — no
    #     shuffle, no Python, the md5 draw inlined in codegen
    from french_admin_etl_spark.operators.sampling import split_assign

    p = plan_of(
        split_assign(docs.select("doc_id", "lang"), ["doc_id"],
                     {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    split_ok = "Exchange" not in p
    check("dataset split is scan-only (no shuffle, no Python)", p,
          ["md5"], ["BatchEvalPython", "ArrowEvalPython", "Window"])
    CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and split_ok,
                  CHECKS[-1][2], CHECKS[-1][3])
    sections.append(("Dataset split assignment (hash draw, scan-speed)", p))

    # 13. incremental near-dup index: band rows are one combinable
    #     aggregation (the minhash groupBy) + row-local explodes — no
    #     Python, no window, a single exchange
    from french_admin_etl_spark.operators.neardup_index import NearDupIndex
    from french_admin_etl_spark.table.lake_table import LakeTable as _LT

    with tempfile.TemporaryDirectory(prefix="audit_nd_") as td:
        idx = NearDupIndex.create(spark, os.path.join(td, "i"), num_buckets=2)
        p = plan_of(idx.rebuild_rows(docs.select("doc_id", "text")))
        band_ok = p.count("Exchange (") <= 1
        check("near-dup band rows: one combinable agg, no Python", p,
              ["partial_min"], ["BatchEvalPython", "ArrowEvalPython", "Window"])
        CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and band_ok,
                      CHECKS[-1][2], CHECKS[-1][3])
        sections.append(("Near-dup index band rows (minhash agg + explode)", p))

        # 14. probe pushdown: on a compacted band_hash-sorted index the
        #     probe's IN filter reaches the parquet scan (row-group
        #     pruning at corpus scale)
        rows = idx.rebuild_rows(docs.limit(200).select("doc_id", "text")).select(
            "doc_id", "band_id", "band_hash",
            F.col("doc_id").alias("lsn"), F.lit("I").alias("op"),
        )
        idx.table.merge(rows, batch_id=0)
        idx.table.compact(sort_cols=["band_hash"], include_clean=True)
        some = [r["band_hash"] for r in idx.table.read().limit(3).collect()]
        p = plan_of(idx.table.read().filter(F.col("band_hash").isin(some)))
        check("probe IN filter pushes to the compacted index scan", p,
              ["In(band_hash"], ["BatchEvalPython"])
        sections.append(("Near-dup probe (pushed IN scan on sorted index)", p))

    # 15. incremental ANN probe: the corpus side is restricted by a
    #     broadcast equi-join on the bucket BEFORE any cosine arithmetic —
    #     never a cartesian or sort-merge over vectors
    from french_admin_etl_spark.operators.ann_index import AnnIndex

    with tempfile.TemporaryDirectory(prefix="audit_ann_") as td:
        aidx = AnnIndex.create(spark, os.path.join(td, "a"), num_buckets=2)
        seed_rows = aidx.rebuild_rows(emb.limit(100)).select(
            "vec_id", "embedding", "bucket",
            F.col("vec_id").alias("lsn"), F.lit("I").alias("op"),
        )
        aidx.table.merge(seed_rows, batch_id=0)
        some_ids = spark.createDataFrame([(1,), (2,)], "vec_id long")
        # materialize=False: the production probe localCheckpoints (eager),
        # which collapses explain() to a Scan ExistingRDD and hides the
        # join shape this assertion exists to pin
        p = plan_of(aidx.probe(some_ids, k=5, materialize=False))
        check("ANN probe restricts by broadcast bucket join (no cartesian)", p,
              ["BroadcastHashJoin"], ["CartesianProduct", "SortMergeJoin"])
        sections.append(("Incremental ANN probe (bucket-restricted top-k)", p))

    # 16. additive view read: SUM resolution is ONE combinable aggregate
    #     (map-side partial sums collapse increments before the shuffle) —
    #     no join, no window, no Python
    with tempfile.TemporaryDirectory(prefix="audit_add_") as td:
        from pyspark.sql import types as _T

        at = LakeTable.create(
            spark, os.path.join(td, "t"),
            _T.StructType([_T.StructField("k", _T.StringType()),
                           _T.StructField("cnt", _T.LongType())]),
            ["k"], num_buckets=2, write_mode="mor",
            properties={"resolution": "additive"},
        )
        inc = lambda rows: spark.createDataFrame(rows, "k string, cnt long")
        at.merge_add(inc([("a", 1), ("b", 2)]), batch_id=0)
        at.merge_add(inc([("a", 3), ("b", -2)]), batch_id=1)
        p = plan_of(at.read())
        check("additive view read: one combinable SUM aggregate", p,
              ["partial_sum"],
              ["Window", "SortMergeJoin", "BroadcastHashJoin", "BatchEvalPython"])
        sections.append(("Additive aggregate-view read resolution", p))

    # 17. sketches: the KMV hash dedup partial-aggregates map-side and
    #     never cross-joins; CMS cells are one combinable groupBy-count
    from french_admin_etl_spark.operators.sketches import cms_build, kmv_distinct

    p = plan_of(
        kmv_distinct(
            ev.select("event_type", F.col("user_id").cast("string").alias("u")),
            "u", ["event_type"], k=64, salt_buckets=8,
        )
    )
    check("KMV sketch: combinable hash dedup, no cartesian, no Python", p,
          ["partial_"], ["CartesianProduct", "BroadcastNestedLoopJoin",
                         "BatchEvalPython", "ArrowEvalPython"])
    sections.append(("KMV distinct sketch (two-phase bottom-k)", p))

    p = plan_of(cms_build(ev.select(F.col("user_id").cast("string").alias("u")), "u"))
    cms_ok = p.count("Exchange (") <= 1
    check("CMS cells: one combinable groupBy-count, no Python", p,
          ["partial_count"], ["Window", "BatchEvalPython", "ArrowEvalPython"])
    CHECKS[-1] = (CHECKS[-1][0], CHECKS[-1][1] and cms_ok,
                  CHECKS[-1][2], CHECKS[-1][3])
    sections.append(("Count-min sketch cells (depth-fanout + one agg)", p))

    # 18. secondary index: the equality predicate is PUSHED into the
    #     narrow index scan (row-group pruning after optimize()), and the
    #     back-join to the source is a real join — never a cartesian,
    #     never Python
    from french_admin_etl_spark.operators.secondary_index import SecondaryIndex

    with tempfile.TemporaryDirectory(prefix="audit_secidx_") as td:
        from pyspark.sql import types as _T

        st = LakeTable.create(
            spark, os.path.join(td, "s"),
            _T.StructType([_T.StructField("id", _T.LongType()),
                           _T.StructField("lang", _T.StringType()),
                           _T.StructField("content", _T.StringType())]),
            ["id"], num_buckets=2, write_mode="mor",
        )
        st.merge(
            spark.createDataFrame(
                [(1, "I", 1, "go", "x"), (2, "I", 2, "py", "y")],
                "lsn long, op string, id long, lang string, content string",
            ),
            batch_id=0,
        )
        sidx = SecondaryIndex.create(spark, st, os.path.join(td, "i"), ["lang"])
        from french_admin_etl_spark.streaming.checkpoint import CheckpointStore

        sidx.sync(CheckpointStore(os.path.join(td, "ck")))
        sidx.optimize()
        p = plan_of(sidx.search(lang="go"))
        check("secondary-index search: pushed equality on the narrow scan", p,
              ["PushedFilters: [", "EqualNullSafe(lang,go)"],
              ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"])
        sections.append(("Secondary-index search (pushed predicate, narrow scan)", p))
        p = plan_of(sidx.rows(lang="go"))
        check("secondary-index rows(): semi back-join, no cartesian, no Python", p,
              ["Join"], ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"])
        sections.append(("Secondary-index rows() back-join", p))

    # 19. join-view enrichment: a real equi-join (broadcastable dimension
    #     side), never cartesian, never Python — the maintained-join read
    #     recompute path
    from french_admin_etl_spark.streaming.joinview import JoinView

    with tempfile.TemporaryDirectory(prefix="audit_jv_") as td:
        from pyspark.sql import types as _T

        lt = LakeTable.create(
            spark, os.path.join(td, "l"),
            _T.StructType([_T.StructField("id", _T.LongType()),
                           _T.StructField("fk", _T.LongType())]),
            ["id"], num_buckets=2, write_mode="mor",
        )
        rt = LakeTable.create(
            spark, os.path.join(td, "r"),
            _T.StructType([_T.StructField("code", _T.LongType()),
                           _T.StructField("label", _T.StringType())]),
            ["code"], num_buckets=2, write_mode="mor",
        )
        lt.merge(spark.createDataFrame([(1, "I", 1, 10)], "lsn long, op string, id long, fk long"), batch_id=0)
        rt.merge(spark.createDataFrame([(1, "I", 10, "x")], "lsn long, op string, code long, label string"), batch_id=0)
        jv = JoinView.create(spark, lt, rt, os.path.join(td, "v"),
                             on=[("fk", "code")], select={"label": "label"})
        p = plan_of(jv._full(lt.current_version(), rt.current_version()))
        check("join-view enrichment: equi-join, no cartesian, no Python", p,
              ["Join"], ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"])
        sections.append(("Join-view enrichment recompute", p))

    # 20. z-order range scan: the range predicate is PUSHED to the parquet
    #     scan (row-group pruning via the narrow per-file stats the Morton
    #     layout produces) and the rank/interleave never needs Python
    with tempfile.TemporaryDirectory(prefix="audit_z_") as td:
        from pyspark.sql import types as _T

        zt = LakeTable.create(
            spark, os.path.join(td, "z"),
            _T.StructType([_T.StructField("id", _T.LongType()),
                           _T.StructField("x", _T.LongType()),
                           _T.StructField("y", _T.LongType())]),
            ["id"], num_buckets=1, write_mode="mor",
        )
        zt.merge(
            spark.createDataFrame(
                [(i + 1, "I", i, i, (37 * i) % 64) for i in range(64)],
                "lsn long, op string, id long, x long, y long",
            ),
            batch_id=0,
        )
        zt.optimize_zorder(["x", "y"], bits=4)
        p = plan_of(zt.scan_range("y", 0, 15))
        check("z-order range scan: predicate pushed to the parquet scan", p,
              ["PushedFilters: [", "GreaterThanOrEqual(y,0)", "LessThanOrEqual(y,15)"],
              ["BatchEvalPython", "ArrowEvalPython"])
        sections.append(("Z-order range scan (multi-dimension pruning)", p))

    # 21. keyed probe via read_raw(key_filter=): the touched-keys semi
    #     join sits in the plan WITH the map-side-combining resolution —
    #     the resolution shuffle moves only the requested keys' physical
    #     rows (the DAG FK gate's child-probe shape, round 4)
    with tempfile.TemporaryDirectory(prefix="audit_kf_") as td:
        from pyspark.sql import types as _T

        kt = LakeTable.create(
            spark, os.path.join(td, "k"),
            _T.StructType([_T.StructField("id", _T.LongType()),
                           _T.StructField("v", _T.StringType())]),
            ["id"], num_buckets=2, write_mode="mor",
        )
        mk = lambda rows: spark.createDataFrame(rows, "lsn long, op string, id long, v string")
        kt.merge(mk([(1, "I", 1, "a"), (2, "I", 2, "b")]), batch_id=0)
        kt.merge(mk([(3, "U", 1, "a2")]), batch_id=1)  # delta -> resolution active
        probe = spark.createDataFrame([(1,)], "id long")
        p = plan_of(kt.read_raw(key_filter=F.broadcast(probe)))
        check("keyed probe: key_filter semi join + map-side resolution", p,
              ["LeftSemi", "partial_max_by"],
              ["CartesianProduct", "SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"])
        sections.append(("Keyed probe (key_filter below MOR resolution)", p))

    # 22. FK-index set probe (the gate delete leg's candidate lookup):
    #     a broadcast semi join against the NARROW index read — never a
    #     scan of the wide source table, never a shuffle join
    with tempfile.TemporaryDirectory(prefix="audit_fkidx_") as td:
        from pyspark.sql import types as _T

        from french_admin_etl_spark.operators.secondary_index import SecondaryIndex
        from french_admin_etl_spark.streaming.checkpoint import CheckpointStore as _CS

        src = LakeTable.create(
            spark, os.path.join(td, "src"),
            _T.StructType([_T.StructField("id", _T.LongType()),
                           _T.StructField("fk", _T.StringType()),
                           _T.StructField("wide", _T.StringType())]),
            ["id"], num_buckets=2, write_mode="mor",
        )
        mk2 = lambda rows: spark.createDataFrame(
            rows, "lsn long, op string, id long, fk string, wide string")
        src.merge(mk2([(1, "I", 1, "a", "w1"), (2, "I", 2, "b", "w2")]), batch_id=0)
        sidx = SecondaryIndex.create(spark, src, os.path.join(td, "idx"), ["fk"])
        sidx.sync(_CS(os.path.join(td, "ck.json")))
        vals = spark.createDataFrame([("a",)], "fk string")
        p = plan_of(sidx.search_in("fk", vals))
        check("fk-index set probe: broadcast semi join on the narrow index", p,
              ["LeftSemi", "BroadcastExchange"],
              ["wide", "CartesianProduct", "SortMergeJoin",
               "BatchEvalPython", "ArrowEvalPython"])
        sections.append(("FK-index set probe (gate delete-leg candidates)", p))

    # 26. WARC source: file-parallel binaryFile scan → ONE Arrow-batched
    #     MapInPandas stage, shuffle-free end-to-end (gzip members are not
    #     byte-splittable, so the file IS the parallel unit; any Exchange
    #     here would be pure waste at 10^5 crawl segments)
    import gzip as _gzip
    import tempfile as _tf

    from french_admin_etl_spark.sources.warc_source import read_warc

    with _tf.TemporaryDirectory() as td:
        body = b"HTTP/1.1 200 X\r\nContent-Type: text/plain\r\n\r\nhi"
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Type: application/http\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )
        with open(os.path.join(td, "seg.warc.gz"), "wb") as fh:
            fh.write(_gzip.compress(rec))
        p = plan_of(read_warc(spark, td))
        check("WARC scan: file-parallel Arrow batch parse, shuffle-free", p,
              ["MapInPandas"],
              ["Exchange", "BatchEvalPython", "CartesianProduct"])
        sections.append(("WARC record scan (binaryFile → MapInPandas)", p))

    out = ["# PLANS — physical-plan audit of the hot paths\n",
           "Generated by `tools/explain_audit.py`; assertions below are the",
           "scale-critical plan properties (pushdown, map-side combine, codegen,",
           "broadcast). Re-run after operator changes.\n", "## Assertions\n"]
    fails = 0
    for name, ok, req, banned in CHECKS:
        fails += 0 if ok else 1
        out.append(f"- {'PASS' if ok else 'FAIL'} — {name} (requires {req}"
                   + (f", forbids {banned}" if banned else "") + ")")
    out.append("\n## Plans\n")
    for title, plan in sections:
        out.append(f"### {title}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("\n".join(o for o in out if not o.startswith("```")))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
