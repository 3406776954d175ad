"""Query inventory — importing this package populates the registry."""

import hive_plan_service_spark.plans.curation_ops  # noqa: F401
import hive_plan_service_spark.plans.extras  # noqa: F401
import hive_plan_service_spark.plans.functions_suite  # noqa: F401
import hive_plan_service_spark.plans.functions_suite2  # noqa: F401
import hive_plan_service_spark.plans.functions_suite3  # noqa: F401
import hive_plan_service_spark.plans.llm_ops  # noqa: F401
import hive_plan_service_spark.plans.reference_ops  # noqa: F401
import hive_plan_service_spark.plans.relational  # noqa: F401
import hive_plan_service_spark.plans.sources_suite  # noqa: F401
import hive_plan_service_spark.plans.streaming_queries  # noqa: F401

from hive_plan_service_spark.plans.registry import (  # noqa: F401
    Query,
    all_queries,
    oracle_sqls,
    query_fns,
    register,
)
