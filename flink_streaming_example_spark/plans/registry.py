"""Query registry — the single source of truth behind __spark_entry__.py.

Each operator from SURVEY.md §2 registers a named query function
``(SparkSession, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL.  The driver hash-compares the two at
sf=0.01; keys registered with ``oracle=None`` get a rows-only check
(SURVEY.md §5.2).

Column-name contract: every computed column is aliased identically in
the DataFrame code and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules whose import registers queries (side-effect registration).
# All are REQUIRED: a missing module is a broken build, not a pending
# one — ModuleNotFoundError propagates.
_OPERATOR_MODULES: tuple[str, ...] = (
    "flink_streaming_example_spark.operators.relational",
    "flink_streaming_example_spark.operators.transforms",
    "flink_streaming_example_spark.operators.aggregations",
    "flink_streaming_example_spark.operators.windows",
    "flink_streaming_example_spark.operators.joins",
    "flink_streaming_example_spark.operators.setops",
    "flink_streaming_example_spark.operators.functions_surface",
    "flink_streaming_example_spark.operators.dedup",
    "flink_streaming_example_spark.operators.similarity",
    "flink_streaming_example_spark.operators.text_analysis",
    "flink_streaming_example_spark.operators.multimodal",
    "flink_streaming_example_spark.operators.udfs",
    "flink_streaming_example_spark.operators.pipeline",
    "flink_streaming_example_spark.streaming.queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query function under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or ""), tags=tuple(tags)
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
