"""Unit tests per operator (SURVEY §2), mirroring the reference's
layer-isolated table-driven style (§5)."""

from pyspark.sql import functions as F

from french_admin_etl_spark.functions.hashing import content_sha, sha256_udf
from french_admin_etl_spark.functions.normalize import (
    normalize_decimal,
    parse_round_int,
    valid_code,
)
from french_admin_etl_spark.operators.dedup import dedup_max_seq, dedup_max_seq_window
from french_admin_etl_spark.operators.filters import allow_list_filter
from french_admin_etl_spark.operators.pivot import pivot_last_write_wins
from french_admin_etl_spark.operators.salting import add_salt, hot_keys
from french_admin_etl_spark.operators.validate import validate_split


def test_allow_list_filter(spark):
    """CsvRecordFilter semantics (CsvRecordFilter_test.go:20-335)."""
    df = spark.createDataFrame(
        [("COM", "a"), ("ARM", "b"), ("DEP", "c"), ("com", "d")], "geo string, v string"
    )
    # AND across columns, IN within column
    assert allow_list_filter(df, {"geo": ["COM", "ARM"]}).count() == 2
    # empty allow-list accepts all
    assert allow_list_filter(df, {}).count() == 4
    # case-sensitive
    assert allow_list_filter(df, {"geo": ["com"]}).count() == 1
    # missing column rejects everything
    assert allow_list_filter(df, {"nope": ["x"]}).count() == 0
    # conjunction
    assert allow_list_filter(df, {"geo": ["COM", "DEP"], "v": ["a"]}).count() == 1


def test_dedup_both_strategies_agree(spark):
    rows = [(k, l, f"v{l}") for k in ["a", "b", "c"] for l in [3, 1, 2]] + [("a", 9, "v9")]
    df = spark.createDataFrame(rows, "k string, lsn long, v string")
    got1 = {(r["k"], r["v"]) for r in dedup_max_seq(df, ["k"]).collect()}
    got2 = {(r["k"], r["v"]) for r in dedup_max_seq_window(df, ["k"]).collect()}
    assert got1 == got2 == {("a", "v9"), ("b", "v3"), ("c", "v3")}
    assert dedup_max_seq(df, ["k"]).columns == df.columns


def test_dedup_exact_duplicate_redelivery(spark):
    df = spark.createDataFrame(
        [("a", 5, "x"), ("a", 5, "x"), ("a", 5, "x")], "k string, lsn long, v string"
    )
    out = dedup_max_seq(df, ["k"]).collect()
    assert len(out) == 1 and out[0]["v"] == "x"


def test_dedup_coalesce_folds_partial_updates(spark):
    from french_admin_etl_spark.operators.dedup import dedup_coalesce

    rows = [
        # key a: partial updates — each column keeps its LAST NON-NULL
        ("a", 1, "I", "x1", "y1"),
        ("a", 2, "U", None, "y2"),
        ("a", 3, "U", "x3", None),
        # key b: delete barrier — post-delete assignment only
        ("b", 1, "I", "bx", "by"),
        ("b", 2, "D", None, None),
        ("b", 3, "I", None, "by3"),
        # key c: ends deleted
        ("c", 1, "I", "cx", None),
        ("c", 2, "D", None, None),
    ]
    df = spark.createDataFrame(rows, "k string, lsn long, op string, x string, y string")
    out = {r["k"]: r.asDict() for r in dedup_coalesce(df, ["k"]).collect()}
    # output = input columns + the intra-batch delete barrier marker
    assert dedup_coalesce(df, ["k"]).columns == df.columns + ["_del_lsn"]
    assert out["a"] == {"k": "a", "lsn": 3, "op": "U", "x": "x3", "y": "y2",
                        "_del_lsn": None}
    # b survived PAST its delete → the barrier LSN rides along so the
    # merge can clear pre-delete state from earlier batches
    assert out["b"] == {"k": "b", "lsn": 3, "op": "U", "x": None, "y": "by3",
                        "_del_lsn": 2}
    assert out["c"] == {"k": "c", "lsn": 2, "op": "D", "x": None, "y": None,
                        "_del_lsn": None}


def test_validate_split_reasons_in_rule_order(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (None, "nullid"), (2, None), (None, None)], "id int, name string"
    )
    valid, rejects = validate_split(
        df, {"null_id": F.col("id").isNotNull(), "null_name": F.col("name").isNotNull()}
    )
    assert valid.count() == 1
    reasons = sorted(r["_reject_reason"] for r in rejects.collect())
    # (None,None) fails BOTH → first rule in order wins
    assert reasons == ["null_id", "null_id", "null_name"]


def test_pivot_last_write_wins(spark):
    """A1: the reference's 33-cell scatter, reduced to 2×2 (age×sex folded
    into one pivot key), with explicit LSN order."""
    rows = [
        ("c1", 2020, "Y_T", 10.0, 1),
        ("c1", 2020, "Y_T", 99.0, 5),  # later seq overwrites
        ("c1", 2020, "Y_M", 4.0, 2),
        ("c2", 2021, "Y_T", 7.0, 3),
    ]
    df = spark.createDataFrame(rows, "code string, annee int, cell string, pop double, lsn long")
    out = pivot_last_write_wins(
        df, ["code", "annee"], "cell", ["Y_T", "Y_M"], "pop", seq_col="lsn"
    )
    got = {(r["code"], r["annee"]): (r["Y_T"], r["Y_M"], r["entity_count"]) for r in out.collect()}
    assert got == {("c1", 2020): (99.0, 4.0, 3), ("c2", 2021): (7.0, None, 1)}


def test_normalize_and_casts(spark):
    """F1-F6 against the reference's parse rules (commune_population_princ.go:38-82)."""
    df = spark.createDataFrame(
        [("34,527109", "2020", "75056"), ("7.2", "bad", "123")],
        "obs string, year string, geo string",
    )
    out = df.select(
        normalize_decimal("obs").alias("d"),
        parse_round_int("obs").alias("i"),
        F.col("year").try_cast("int").alias("y"),  # F4: Atoi error ⇒ null ⇒ drop
        valid_code("geo", length=5).alias("vlen"),
    ).collect()
    assert out[0]["d"] == 34.527109 and out[0]["i"] == 35 and out[0]["y"] == 2020
    assert out[0]["vlen"] is True
    assert out[1]["i"] == 7 and out[1]["y"] is None and out[1]["vlen"] is False
    # round-half-up matches Go math.Round on the non-negative domain
    half = spark.createDataFrame([("2,5",), ("3,5",)], "obs string")
    assert [r["i"] for r in half.select(parse_round_int("obs").alias("i")).collect()] == [3, 4]


def test_sha256_udf_equals_jvm_sha2(spark):
    df = spark.createDataFrame([("hello",), (None,), ("Ω unicode",)], "c string")
    out = df.select(
        sha256_udf(F.col("c")).alias("py"), content_sha("c").alias("jvm")
    ).collect()
    for r in out:
        assert r["py"] == r["jvm"]


def test_hot_keys_and_salt(spark):
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, lsn long")
    hk = hot_keys(df, ["k"], sample_fraction=0.5, min_share=0.5, seed=1).collect()
    assert [r["k"] for r in hk] == ["hot"]
    salted = add_salt(df, 8)
    vals = {r["_salt"] for r in salted.select("_salt").distinct().collect()}
    assert vals.issubset(set(range(8))) and len(vals) > 1
    # deterministic across invocations (replay-safe)
    again = {r["lsn"]: r["_salt"] for r in add_salt(df, 8).collect()}
    first = {r["lsn"]: r["_salt"] for r in salted.collect()}
    assert again == first


def test_lsh_banded_cache_bounded_to_one(spark):
    """Review finding (round 5): every lsh_candidate_pairs call persisted
    its banded frame and never released it — a driver looping over
    corpora leaked one CacheManager entry per call for the session's
    lifetime. The bounded form keeps AT MOST ONE outstanding cache:
    repeated calls over the same corpus share it (the fast path), a
    different corpus retires the previous entry."""
    from french_admin_etl_spark.operators.textdedup import (
        _BANDED_CACHE,
        lsh_candidate_pairs,
        minhash_signature,
    )

    # getPersistentRDDs is SESSION-GLOBAL: other tests' cleaner-tracked
    # localCheckpoint blocks can linger until GC, so assert no GROWTH
    # beyond the one bounded cache entry relative to a baseline instead
    # of an absolute count (full-suite flake otherwise)
    base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    for tag in ("x", "y", "z"):
        docs = spark.createDataFrame(
            [(i, f"{tag} doc {i} common tail words here") for i in range(30)],
            ["doc_id", "text"],
        )
        sig = minhash_signature(docs, "doc_id", "text", num_hashes=16, shingle_n=3)
        lsh_candidate_pairs(sig, "doc_id").count()
        assert len(_BANDED_CACHE) == 1
        n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        assert n_cached - base <= 1, f"leaked {n_cached - base} cached frames"


def test_mean_token_len_counts_all_whitespace(spark):
    """Review finding: mean_token_len subtracted only ASCII spaces while
    tokens split on \\s+ — 'a\\nb\\nc' read 5/3 instead of 1."""
    from french_admin_etl_spark.functions.text import quality_features

    df = spark.createDataFrame([("a\nb\nc",), ("aa\tbb  cc\r\ndd",)], "text string")
    feats = quality_features("text")
    got = df.select(
        feats["mean_token_len"].alias("mtl"), feats["n_tokens"].alias("nt")
    ).collect()
    assert got[0]["nt"] == 3 and abs(got[0]["mtl"] - 1.0) < 1e-9
    assert got[1]["nt"] == 4 and abs(got[1]["mtl"] - 2.0) < 1e-9


def test_redact_pii_unseparated_french_number(spark):
    """Review finding: the FR national pattern required a separator
    between every digit pair, so the dominant written form 0612345678
    leaked unredacted."""
    from french_admin_etl_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("appelez 0612345678 svp",), ("tel: 06 12 34 56 78 ok",)], "t string"
    )
    got = df.select(redact_pii("t").alias("r")).collect()
    assert all("<PHONE>" in r["r"] for r in got)
    assert all("0612345678" not in r["r"] for r in got)
    n = df.select(pii_counts("t")["n_phone"].alias("n")).collect()
    assert [r["n"] for r in n] == [1, 1]
