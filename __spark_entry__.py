"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_streaming_example_spark: the registry in
plans/registry.py is the single source of truth for query keys, query
functions, and oracle SQL (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_example_spark.plans.registry import all_specs  # noqa: E402

FLAGSHIP = "q_groupby_report"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_specs()[FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (omitted -> rows-only)."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
