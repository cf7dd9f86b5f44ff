from flink_streaming_example_spark.plans.registry import QuerySpec, all_specs, register

__all__ = ["QuerySpec", "all_specs", "register"]
