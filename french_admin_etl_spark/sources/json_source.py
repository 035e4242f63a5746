"""S4/P6: nested-JSON (GeoJSON-shaped) source with explicit schema.

Reference: ``internal/extractors/geojson_extractor.go:35-108`` — a
token-streaming parser that walks to the "features" array and decodes one
nested feature at a time for bounded memory. The Spark analog keeps the
same contract with a declarative scan:

- ``read_feature_collection``: a ``multiLine`` JSON scan with the explicit
  feature schema. Jackson token-streams the file inside the scan task (no
  whole-file text row is ever materialized, unlike a ``wholetext`` +
  ``from_json`` plan, which holds the raw text AND the parsed tree in one
  task's heap); schema pruning drops unrequested fields at parse time.
  Memory is bounded per FILE (one FeatureCollection object = one record),
  and a directory of collections parallelizes per file — the standard
  layout for bulk GeoJSON exports.
- ``read_features_ndjson``: the true 100-TB path — features pre-split one
  JSON object per line (ndjson/GeoJSONSeq, as produced by ``ogr2ogr -f
  GeoJSONSeq`` or a one-pass splitter). Line-delimited JSON is SPLITTABLE
  WITHIN a file, so memory is bounded per feature and parallelism is
  bounded only by block count.

The opaque geometry blob (``internal/model/entities.go:28-42``) maps to a
``StringType`` field in the feature schema: Spark's JacksonParser captures
the raw JSON substring verbatim for object-valued fields declared as
string — exactly the "don't decode what you only store" P6 contract, and
the shape the engine's ``content`` column generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feature_schema(properties: T.StructType) -> T.StructType:
    """One GeoJSON Feature: typed properties + geometry kept as a raw JSON
    string (coordinates depth varies by geometry type; a fixed-depth array
    type would be lossy — the raw text is the faithful opaque blob)."""
    return T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("properties", properties),
            T.StructField("geometry", T.StringType()),
        ]
    )


def collection_schema(properties: T.StructType) -> T.StructType:
    """FeatureCollection wrapper around :func:`feature_schema`."""
    return T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("features", T.ArrayType(feature_schema(properties))),
        ]
    )


def read_feature_collection(
    spark: SparkSession, path: str, properties: T.StructType
) -> DataFrame:
    """FeatureCollection file(s) → one row per feature: typed property
    columns + ``geometry_json`` opaque string (P6). Bounded memory: the
    scan parses with Jackson token streaming under the explicit schema —
    no whole-file text row (S4; geojson_extractor.go:35-81 contract)."""
    raw = spark.read.option("multiLine", "true").schema(collection_schema(properties)).json(path)
    return (
        raw.select(F.explode("features").alias("f"))
        .select("f.properties.*", F.col("f.geometry").alias("geometry_json"))
    )


def read_features_ndjson(
    spark: SparkSession, path: str, properties: T.StructType
) -> DataFrame:
    """Line-delimited features (GeoJSONSeq/ndjson) → same output shape as
    :func:`read_feature_collection`, but splittable WITHIN files: per-task
    memory is one feature, not one collection — the 100-TB ingest path."""
    raw = spark.read.schema(feature_schema(properties)).json(path)
    return raw.select("properties.*", F.col("geometry").alias("geometry_json"))
