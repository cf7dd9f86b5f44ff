from flink_streaming_example_spark.sources.tables import TABLE_NAMES, load_table, tables

__all__ = ["TABLE_NAMES", "load_table", "tables"]
