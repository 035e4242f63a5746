from french_admin_etl_spark.plans.schema_registry import SchemaRegistry

__all__ = ["SchemaRegistry"]
