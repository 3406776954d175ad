from hive_plan_service_spark.functions.exact import money, rate, dsum, davg

__all__ = ["money", "rate", "dsum", "davg"]
