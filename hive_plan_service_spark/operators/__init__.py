from hive_plan_service_spark.operators.bitmask import (
    expand_groups_flat,
    expand_groups_nested,
)
from hive_plan_service_spark.operators.counter import current_counter_value

__all__ = [
    "expand_groups_flat",
    "expand_groups_nested",
    "current_counter_value",
]
