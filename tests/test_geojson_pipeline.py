"""End-to-end parity with the reference's GeoJSON dimension pipeline
(``cmd/main.go:45-108``): regions → departements → epci → communes loaded
in FK-dependency order, each as

  read_feature_collection (S4)  →  P3 mapper (rename/project)
    → J1 fk_validate null-out (commune_repository.go:53-64 NULLIF)
    → S6 full-row keyed MERGE into a LakeTable (ON CONFLICT DO UPDATE)

with the FK graph (migrations/000003:28,63-65) asserted via J2
``fk_orphans`` instead of declarative constraints. The commune fixture
mirrors the reference's real-world case: one commune references an EPCI
that does not exist (communes hors EPCI) — its FK must null out, not
poison the load. This is the dimension twin of
``tests/test_reference_pipeline.py`` (the CSV population pipeline).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.dim_join import fk_orphans, fk_validate
from french_admin_etl_spark.sources.json_source import read_feature_collection
from french_admin_etl_spark.table.lake_table import LakeTable

GEOM = {"type": "MultiPolygon", "coordinates": [[[[2.0, 48.0], [2.5, 48.5], [2.0, 48.5], [2.0, 48.0]]]]}


def _fc(features):
    return json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "properties": props, "geometry": GEOM}
                for props in features
            ],
        }
    )


REGIONS = [{"code": "11", "nom": "Île-de-France"}, {"code": "32", "nom": "Hauts-de-France"}]
DEPARTEMENTS = [
    {"code": "75", "nom": "Paris", "region": "11"},
    {"code": "59", "nom": "Nord", "region": "32"},
]
EPCI = [{"code": "200054781", "nom": "Métropole du Grand Paris"}]
COMMUNES = [
    {"code": "75056", "nom": "Paris", "epci": "200054781", "departement": "75", "region": "11"},
    # communes hors EPCI: references an EPCI that is NOT in the dimension —
    # the reference nulls the FK instead of failing (NULLIF pattern)
    {"code": "59350", "nom": "Lille", "epci": "MISSING_EPCI", "departement": "59", "region": "32"},
]


def _props(*names):
    return T.StructType([T.StructField(n, T.StringType()) for n in names])


def _load_dim(spark, tmp, name, fc_json, props, mapper_cols, key):
    """One reference GeoJSONETLProcessor run: extract → map → merge."""
    path = os.path.join(tmp, f"{name}.geojson")
    with open(path, "w") as fh:
        fh.write(fc_json)
    feats = read_feature_collection(spark, path, props)
    mapped = feats.select(*[F.col(src).alias(dst) for src, dst in mapper_cols])
    schema = T.StructType([T.StructField(c, T.StringType()) for _, c in mapper_cols])
    table = LakeTable.create(spark, os.path.join(tmp, name), schema, [key], num_buckets=4)
    src = mapped.withColumn("lsn", F.lit(1).cast("long")).withColumn("op", F.lit("I"))
    table.merge(src, batch_id=0)
    return table, mapped


@pytest.fixture()
def loaded(spark, tmp_root):
    regions, _ = _load_dim(
        spark, tmp_root, "regions", _fc(REGIONS), _props("code", "nom"),
        [("code", "code_insee_region"), ("nom", "nom_region"),
         ("geometry_json", "geom")],
        "code_insee_region",
    )
    departements, _ = _load_dim(
        spark, tmp_root, "departements", _fc(DEPARTEMENTS),
        _props("code", "nom", "region"),
        [("code", "code_insee_departement"), ("nom", "nom_departement"),
         ("region", "code_insee_region"), ("geometry_json", "geom")],
        "code_insee_departement",
    )
    epci, _ = _load_dim(
        spark, tmp_root, "epci", _fc(EPCI), _props("code", "nom"),
        [("code", "code_insee_epci"), ("nom", "nom_epci"), ("geometry_json", "geom")],
        "code_insee_epci",
    )

    # communes: J1 null-out against the EPCI dimension BEFORE the merge
    path = os.path.join(tmp_root, "communes.geojson")
    with open(path, "w") as fh:
        fh.write(_fc(COMMUNES))
    feats = read_feature_collection(
        spark, path, _props("code", "nom", "epci", "departement", "region")
    )
    mapped = feats.select(
        F.col("code").alias("code_insee_commune"),
        F.col("nom").alias("nom_commune"),
        F.col("epci").alias("code_insee_epci"),
        F.col("departement").alias("code_insee_departement"),
        F.col("region").alias("code_insee_region"),
        F.col("geometry_json").alias("geom"),
    )
    validated = fk_validate(mapped, epci.read(), "code_insee_epci")
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in validated.columns]
    )
    communes = LakeTable.create(
        spark, os.path.join(tmp_root, "communes"), schema,
        ["code_insee_commune"], num_buckets=4,
    )
    communes.merge(
        validated.withColumn("lsn", F.lit(1).cast("long")).withColumn("op", F.lit("I")),
        batch_id=0,
    )
    return regions, departements, epci, communes


def test_fk_order_load_matches_reference_semantics(spark, loaded):
    regions, departements, epci, communes = loaded
    rows = {r["code_insee_commune"]: r for r in communes.read().collect()}
    assert set(rows) == {"75056", "59350"}
    # Paris keeps its EPCI (exists); Lille's missing EPCI nulled out,
    # but departement/region FKs survive (reference NULLIF semantics)
    assert rows["75056"]["code_insee_epci"] == "200054781"
    assert rows["59350"]["code_insee_epci"] is None
    assert rows["59350"]["code_insee_departement"] == "59"
    assert rows["59350"]["code_insee_region"] == "32"
    # geometry blob survived opaque end-to-end (P6)
    assert '"MultiPolygon"' in rows["75056"]["geom"]


def test_fk_graph_integral_after_load(spark, loaded):
    """J2: the declarative FK graph holds — zero orphans on every edge."""
    regions, departements, epci, communes = loaded
    c, d = communes.read(), departements.read()
    edges = [
        (d, regions.read(), "code_insee_region"),
        (c, epci.read(), "code_insee_epci"),
        (c, d, "code_insee_departement"),
        (c, regions.read(), "code_insee_region"),
    ]
    for fact, dim, fk in edges:
        assert fk_orphans(fact, dim, fk).count() == 0, fk


def test_rerun_is_idempotent_upsert(spark, tmp_root, loaded):
    """ON CONFLICT DO UPDATE parity (region_repository.go:38-42): reloading
    the same collection with a newer LSN updates in place, no duplicates."""
    regions, *_ = loaded
    updated = spark.createDataFrame(
        [("11", "Île-de-France (v2)", "{}")],
        "code_insee_region string, nom_region string, geom string",
    ).withColumn("lsn", F.lit(2).cast("long")).withColumn("op", F.lit("U"))
    regions.merge(updated, batch_id=1)
    rows = {r["code_insee_region"]: r["nom_region"] for r in regions.read().collect()}
    assert rows == {"11": "Île-de-France (v2)", "32": "Hauts-de-France"}
