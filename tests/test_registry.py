"""Schema registry: the migration-runner analog (run_migrations.go:20-80)."""

import os

from pyspark.sql import types as T

from french_admin_etl_spark.plans.schema_registry import SchemaRegistry
from french_admin_etl_spark.streaming.apply import KEYS, REPOS_SCHEMA
from french_admin_etl_spark.table.lake_table import LakeTable, SchemaOp


def test_registry_ensure_idempotent(spark, tmp_root):
    reg = SchemaRegistry(os.path.join(tmp_root, "registry.json"))
    reg.register(2, [SchemaOp(action="add_column", name="stars", type="int")])
    reg.register(3, [SchemaOp(action="widen", name="stars", type="bigint")])
    reg.register(4, [SchemaOp(action="rename_column", from_name="lang", to_name="language")])

    table = LakeTable.create(spark, os.path.join(tmp_root, "t"), REPOS_SCHEMA, KEYS)
    assert reg.ensure(table) == 4
    cols = dict(table.read().dtypes)
    assert cols["stars"] == "bigint" and "language" in cols and "lang" not in cols
    # rerun = no-op (recorded current version)
    v = table.current_version()
    assert reg.ensure(table) == 4
    assert table.current_version() == v


def test_registry_schema_for_replays_ops(tmp_root):
    reg = SchemaRegistry(os.path.join(tmp_root, "registry.json"))
    reg.register(2, [SchemaOp(action="add_column", name="stars", type="int")])
    base = T.StructType([T.StructField("repo", T.StringType()), T.StructField("lang", T.StringType())])
    s2 = reg.schema_for(base, 2)
    assert [f.name for f in s2.fields] == ["repo", "lang", "stars"]
    # reload from disk round-trips
    reg2 = SchemaRegistry(os.path.join(tmp_root, "registry.json"))
    assert reg2.latest() == 2
