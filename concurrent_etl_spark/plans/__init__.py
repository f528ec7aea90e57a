from concurrent_etl_spark.plans.explain import plan_string

__all__ = ["plan_string"]
