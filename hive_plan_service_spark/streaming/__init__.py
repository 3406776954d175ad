from hive_plan_service_spark.streaming.source import events_stream
from hive_plan_service_spark.streaming.windows import (
    run_to_completion,
    session_windows,
    tumbling_window_agg,
)

__all__ = [
    "events_stream",
    "run_to_completion",
    "session_windows",
    "tumbling_window_agg",
]
