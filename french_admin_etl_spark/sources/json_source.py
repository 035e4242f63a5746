"""S4/P6: nested-JSON (GeoJSON-shaped) source with explicit schema.

Reference: ``internal/extractors/geojson_extractor.go:35-108`` — a
token-streaming parser that walks to the "features" array and decodes one
nested feature at a time for bounded memory. Spark's JSON scan is already
streaming/columnar; ``multiLine`` handles a whole FeatureCollection file,
and the opaque geometry blob (``internal/model/entities.go:28-42``) becomes
``to_json(struct)`` — an opaque string content column, exactly the shape
the engine's `content` column generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feature_schema(properties: T.StructType) -> T.StructType:
    """FeatureCollection schema with typed properties and open geometry."""
    feat = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("properties", properties),
            T.StructField(
                "geometry",
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        # coordinates depth varies by geometry type; keep the
                        # raw JSON text as the opaque blob instead of a
                        # lossy fixed-depth array type.
                    ]
                ),
            ),
        ]
    )
    return T.StructType(
        [T.StructField("type", T.StringType()), T.StructField("features", T.ArrayType(feat))]
    )


def read_feature_collection(
    spark: SparkSession, path: str, properties: T.StructType
) -> DataFrame:
    """FeatureCollection file → one row per feature:
    typed property columns + `geometry_json` opaque string (P6)."""
    raw = spark.read.option("multiLine", "true").text(path, wholetext=True)
    # Parse twice from the same text scan: typed properties via from_json
    # with an explicit schema, geometry kept verbatim via get_json_object
    # per feature index — but per-feature JSON extraction needs the array
    # exploded first, so parse features as raw strings then re-parse.
    feats_as_str = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("features", T.ArrayType(T.StringType())),
        ]
    )
    # from_json with ArrayType(StringType) keeps each feature's raw JSON? No —
    # Spark re-serializes; use schema_of_json-free explicit approach:
    exploded = (
        raw.select(F.from_json("value", feats_as_str).alias("fc"))
        .select(F.explode("fc.features").alias("feature_json"))
    )
    prop_schema = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("properties", properties),
        ]
    )
    return exploded.select(
        F.from_json("feature_json", prop_schema).alias("f"),
        F.get_json_object("feature_json", "$.geometry").alias("geometry_json"),
    ).select("f.properties.*", "geometry_json")
