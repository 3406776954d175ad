from hive_plan_service_spark.sources.catalog import (
    TABLES,
    register_tables,
    table_path,
)

__all__ = ["TABLES", "register_tables", "table_path"]
