"""Source tests mirroring the reference's extractor suites
(csv_extractor_test.go / geojson_extractor_test.go)."""

import os

from pyspark.sql import types as T

from french_admin_etl_spark.sources.csv_source import read_csv_stream_shaped
from french_admin_etl_spark.sources.json_source import read_feature_collection

CSV_SCHEMA = T.StructType(
    [
        T.StructField("AGE", T.StringType()),
        T.StructField("GEO", T.StringType()),
        T.StructField("OBS_VALUE", T.StringType()),
    ]
)


def _write(tmp_root, name, text):
    p = os.path.join(tmp_root, name)
    with open(p, "w") as fh:
        fh.write(text)
    return p


def test_csv_semicolon_header_binding(spark, tmp_root):
    p = _write(tmp_root, "pop.csv", 'AGE;GEO;OBS_VALUE\n"_T";"75056";34.5\n"Y_LT15";"13055";7\n')
    df = read_csv_stream_shaped(spark, p, CSV_SCHEMA, delimiter=";")
    rows = df.collect()
    assert len(rows) == 2 and rows[0]["GEO"] == "75056"


def test_csv_malformed_row_dropped(spark, tmp_root):
    """csv_extractor_test.go:201-229: 3 rows in, arity-mismatched dropped."""
    p = _write(tmp_root, "bad.csv", "AGE;GEO;OBS_VALUE\na;b;c\nonlyone\nx;y;z;EXTRA\n")
    df = read_csv_stream_shaped(spark, p, CSV_SCHEMA, delimiter=";")
    assert df.count() == 1  # only the well-formed row survives


def test_csv_dead_letter_keeps_corrupt_rows(spark, tmp_root):
    p = _write(tmp_root, "bad2.csv", "AGE;GEO;OBS_VALUE\na;b;c\nd;e;f;EXTRA\n")
    good, bad = read_csv_stream_shaped(spark, p, CSV_SCHEMA, delimiter=";", dead_letter=True)
    assert good.count() == 1
    assert bad.count() == 1 and "EXTRA" in bad.collect()[0]["_corrupt_record"]


def test_csv_header_only(spark, tmp_root):
    """csv_processor_test.go:229-252: header-only file → zero rows, no error."""
    p = _write(tmp_root, "empty.csv", "AGE;GEO;OBS_VALUE\n")
    assert read_csv_stream_shaped(spark, p, CSV_SCHEMA, delimiter=";").count() == 0


GEOJSON = """{"type": "FeatureCollection", "features": [
  {"type": "Feature", "properties": {"code": "01", "nom": "Guadeloupe"},
   "geometry": {"type": "MultiPolygon", "coordinates": [[[[ -61.7, 16.0 ], [ -61.6, 16.1 ], [ -61.5, 16.0 ], [ -61.7, 16.0 ]]]]}},
  {"type": "Feature", "properties": {"code": "02", "nom": "Martinique"},
   "geometry": null}
]}"""


def test_geojson_features_and_opaque_geometry(spark, tmp_root):
    """geojson_extractor_test.go:14-146: typed properties + geometry fidelity;
    null geometry survives as null blob (dropped later by the sink, P6)."""
    p = _write(tmp_root, "regions.geojson", GEOJSON)
    props = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("nom", T.StringType())]
    )
    df = read_feature_collection(spark, p, props)
    rows = {r["code"]: r for r in df.collect()}
    assert set(rows) == {"01", "02"}
    assert rows["01"]["nom"] == "Guadeloupe"
    assert '"MultiPolygon"' in rows["01"]["geometry_json"]
    assert "-61.7" in rows["01"]["geometry_json"]
    assert rows["02"]["geometry_json"] is None


def test_geojson_empty_collection(spark, tmp_root):
    p = _write(tmp_root, "empty.geojson", '{"type": "FeatureCollection", "features": []}')
    props = T.StructType([T.StructField("code", T.StringType())])
    assert read_feature_collection(spark, p, props).count() == 0


def test_geojson_scan_is_streaming_json_not_whole_file_text(spark, tmp_root):
    """S4 bounded-memory contract (geojson_extractor.go:35-81): the plan
    must be a schema-pruned JSON scan (Jackson token streaming inside the
    scan task), NOT a whole-file text row piped through from_json."""
    p = _write(tmp_root, "plan.geojson", GEOJSON)
    props = T.StructType([T.StructField("code", T.StringType())])
    df = read_feature_collection(spark, p, props)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan json" in plan, plan
    assert "FileScan text" not in plan, plan


NDJSON = (
    '{"type": "Feature", "properties": {"code": "01", "nom": "Guadeloupe"},'
    ' "geometry": {"type": "Point", "coordinates": [-61.7, 16.0]}}\n'
    '{"type": "Feature", "properties": {"code": "02", "nom": "Martinique"},'
    ' "geometry": null}\n'
)


def test_ndjson_features_splittable_same_shape(spark, tmp_root):
    """GeoJSONSeq path: one feature per line, same output contract as the
    FeatureCollection reader (the within-file-splittable 100-TB path)."""
    from french_admin_etl_spark.sources.json_source import read_features_ndjson

    p = _write(tmp_root, "regions.ndjson", NDJSON)
    props = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("nom", T.StringType())]
    )
    df = read_features_ndjson(spark, p, props)
    rows = {r["code"]: r for r in df.collect()}
    assert set(rows) == {"01", "02"}
    assert '"Point"' in rows["01"]["geometry_json"] and "-61.7" in rows["01"]["geometry_json"]
    assert rows["02"]["geometry_json"] is None
    assert df.columns == ["code", "nom", "geometry_json"]
