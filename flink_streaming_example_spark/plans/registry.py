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
    "flink_streaming_example_spark.operators.tpch",
    "flink_streaming_example_spark.operators.tpch_full",
    "flink_streaming_example_spark.operators.cep",
    "flink_streaming_example_spark.operators.sampling",
    "flink_streaming_example_spark.operators.datapipe",
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


def _last_verified_round() -> dict[str, int]:
    """Per query key, the latest driver round whose CORRECTNESS_r*.json
    recorded a check of it (any outcome — the point is the driver LOOKED).

    The driver verifies queries() in dict-insertion order and stops
    after a fixed budget (CORRECTNESS_r02 recorded exactly the first 50
    of 81 keys), so a static ordering would leave the tail permanently
    unverified.  We rotate instead: see all_specs().
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for key in data:
                seen[key] = max(rnd, seen.get(key, 0))
    return seen


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry,
    ordered least-recently-driver-verified first (never-verified keys,
    i.e. new this round, lead) so the driver's bounded correctness pass
    reaches every key across rounds.  Registration order breaks ties,
    which keeps the ordering deterministic."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    last = _last_verified_round()
    names = list(_REGISTRY)
    order = {name: i for i, name in enumerate(names)}
    names.sort(key=lambda n: (last.get(n, -1), order[n]))
    return {name: _REGISTRY[name] for name in names}
