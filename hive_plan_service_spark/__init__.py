"""hive_plan_service_spark — a PySpark-native analytics engine.

A brand-new Spark SQL + Catalyst engine providing the capability closure
of the reference plan service (``titan/hive-plan-service``, see SURVEY.md):
its literal surface (bitmask-expansion join, materialized entity views,
counter semantics — SURVEY.md §2.A, src/plan-server.ts / src/plan-processor.ts)
plus the relational/streaming/LLM-data-pipeline operators mandated by the
north star (SURVEY.md §2.B), every one designed for 100 TB scale:
declarative DataFrame plans, Catalyst pushdown/pruning, broadcast for dims,
AQE for skew, no driver-side collect in any data path.
"""

from hive_plan_service_spark.session import get_spark, tune
from hive_plan_service_spark.sources.catalog import register_tables

__all__ = ["get_spark", "tune", "register_tables"]
