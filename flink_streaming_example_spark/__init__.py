"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference stream-processing example repo
(`dspathak/flink-streaming-example`).

Architecture stance (SURVEY.md §0, §4): NOT a port of the reference's
runtime. Batch queries are DataFrame expression trees optimized by
Catalyst; streaming semantics are Structured Streaming. Operators are
plain functions ``(SparkSession, sf_dir) -> DataFrame`` registered in
:mod:`flink_streaming_example_spark.plans.registry`.

Provenance note: the reference checkout at /root/reference was empty at
survey time (SURVEY.md §0), so docstrings cite the canonical Flink public
API surface (e.g. ``DataStream#keyBy``) that repos of this name are built
on, plus SURVEY.md §2 row ids, instead of file:line cites.
"""

__version__ = "0.1.0"
