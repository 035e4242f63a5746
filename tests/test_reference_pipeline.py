"""Reference-parity e2e: the full CSV population pipeline composed from
engine operators, mirroring cmd/main.go:110-120 → csv_processor → mapper →
pivot → coalesce upsert (reference files cited per stage).

CSV fixture shape follows the reference golden file
``internal/processor/testdata/population.csv`` (header
AGE;GEO;GEO_OBJECT;RP_MEASURE;SEX;TIME_PERIOD;OBS_VALUE, ';' delimiter,
decimal values)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.functions.normalize import parse_round_int, valid_code
from french_admin_etl_spark.operators.filters import allow_list_filter
from french_admin_etl_spark.operators.pivot import pivot_last_write_wins
from french_admin_etl_spark.operators.validate import validate_split
from french_admin_etl_spark.sources.csv_source import read_csv_stream_shaped
from french_admin_etl_spark.table.lake_table import LakeTable

CSV_SCHEMA = T.StructType(
    [
        T.StructField("AGE", T.StringType()),
        T.StructField("GEO", T.StringType()),
        T.StructField("GEO_OBJECT", T.StringType()),
        T.StructField("RP_MEASURE", T.StringType()),
        T.StructField("SEX", T.StringType()),
        T.StructField("TIME_PERIOD", T.StringType()),
        T.StructField("OBS_VALUE", T.StringType()),
    ]
)

ROWS = [
    # code 75056 (kept): two ages x two sexes, decimal comma + point mix
    "Y_LT15;75056;COM;POP;M;2022;120,6",
    "Y_LT15;75056;COM;POP;F;2022;130.2",
    "Y15T24;75056;COM;POP;M;2022;90,4",
    "Y15T24;75056;COM;POP;F;2022;85",
    # redelivered row: last write wins (same cell, newer value)
    "Y_LT15;75056;COM;POP;M;2022;121,5",
    # ARM kept too
    "Y_LT15;13201;ARM;POP;M;2022;55,0",
    # dropped by allow-list: DEP
    "Y_LT15;75;DEP;POP;M;2022;999",
    # dropped by validation: bad GEO length, bad SEX, unparsable year
    "Y_LT15;7505;COM;POP;M;2022;10",
    "Y_LT15;75056;COM;POP;X;2022;10",
    "Y_LT15;75056;COM;POP;M;20X2;10",
]

AGES = ["Y_LT15", "Y15T24"]
SEXES = ["M", "F"]


def test_reference_population_pipeline(spark, tmp_root):
    # --- source scan S1-S3 (csv_extractor.go:106-126) ------------------
    path = os.path.join(tmp_root, "population.csv")
    with open(path, "w") as fh:
        fh.write("AGE;GEO;GEO_OBJECT;RP_MEASURE;SEX;TIME_PERIOD;OBS_VALUE\n")
        fh.write("\n".join(ROWS))
    raw = read_csv_stream_shaped(spark, path, CSV_SCHEMA, delimiter=";")

    # --- allow-list filter P1/P2 (CsvRecordFilter.go:22-39) ------------
    kept = allow_list_filter(raw, {"GEO_OBJECT": ["COM", "ARM"]})
    assert kept.count() == len(ROWS) - 1

    # --- validating map P4/F1-F6 (commune_population_princ.go:38-82) ---
    mapped = kept.select(
        F.col("AGE").alias("age"),
        F.col("GEO").alias("code"),
        F.col("SEX").alias("sexe"),
        F.col("TIME_PERIOD").try_cast("int").alias("annee"),
        parse_round_int("OBS_VALUE").alias("population"),
    )
    valid, rejects = validate_split(
        mapped,
        {
            "bad_age": F.col("age").isin(AGES),
            "bad_code": valid_code("code", length=5),
            "bad_sex": F.col("sexe").isin(SEXES),
            "bad_year": F.col("annee").isNotNull(),
            "bad_pop": F.col("population").isNotNull() & (F.col("population") >= 0),
        },
    )
    assert rejects.count() == 3
    reasons = {r["_reject_reason"] for r in rejects.collect()}
    assert reasons == {"bad_code", "bad_sex", "bad_year"}

    # --- pivot long→wide A1/A2 (commune_population_repository.go:68-170)
    valid = valid.withColumn("age_sexe", F.concat_ws("_", "age", "sexe")).withColumn(
        "seq", F.monotonically_increasing_id()
    )
    cells = [f"{a}_{s}" for a in AGES for s in SEXES]
    wide = pivot_last_write_wins(
        valid, ["code", "annee"], "age_sexe", cells, "population", seq_col="seq"
    )

    # --- coalesce-merge sink S7 (ON CONFLICT ... COALESCE, :201-264) ---
    schema = T.StructType(
        [T.StructField("code", T.StringType(), False),
         T.StructField("annee", T.IntegerType(), False)]
        + [T.StructField(c, T.IntegerType(), True) for c in cells]
        + [T.StructField("entity_count", T.LongType(), True)]
    )
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "pop"), schema=schema,
        key_cols=["code", "annee"], num_buckets=4,
    )
    src = wide.withColumn("lsn", F.lit(1)).withColumn("op", F.lit("U"))
    table.merge(src, mode="coalesce", batch_id=1)

    got = {(r["code"], r["annee"]): r for r in table.read().collect()}
    paris = got[("75056", 2022)]
    # redelivered cell: LAST write wins (121,5 → 122, not 120,6 → 121)
    assert paris["Y_LT15_M"] == 122
    assert paris["Y_LT15_F"] == 130
    assert paris["Y15T24_M"] == 90
    assert paris["Y15T24_F"] == 85
    assert paris["entity_count"] == 5
    arm = got[("13201", 2022)]
    assert arm["Y_LT15_M"] == 55 and arm["Y15T24_F"] is None

    # --- partial re-import with only one cell: COALESCE keeps the rest --
    patch = spark.createDataFrame(
        [("75056", 2022, 200, None, None, None, 1, 2, "U")],
        "code string, annee int, Y_LT15_M int, Y_LT15_F int, Y15T24_M int,"
        " Y15T24_F int, entity_count long, lsn long, op string",
    )
    table.merge(patch, mode="coalesce", batch_id=2)
    paris2 = {(r["code"], r["annee"]): r for r in table.read().collect()}[("75056", 2022)]
    assert paris2["Y_LT15_M"] == 200        # new non-null wins
    assert paris2["Y_LT15_F"] == 130        # null cell preserved old value
    assert paris2["Y15T24_F"] == 85
