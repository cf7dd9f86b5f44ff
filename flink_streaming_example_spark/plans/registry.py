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
    "flink_streaming_example_spark.streaming.upsert",
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


def _verification_history() -> dict[str, tuple[int, bool]]:
    """Per query key: (latest driver round whose CORRECTNESS_r*.json
    recorded a check of it, did that latest check pass).

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
    seen: dict[str, tuple[int, bool]] = {}
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
        if not isinstance(data, dict):
            continue
        for key, rec in data.items():
            ok = True
            if isinstance(rec, dict):
                # rows-only keys have null matches; only an explicit
                # False (or a recorded error) counts as a failure.
                ok = (
                    rec.get("rows_match") is not False
                    and rec.get("hash_match") is not False
                    and rec.get("err") in (None, "no_oracle")
                )
            prev = seen.get(key)
            if prev is None or rnd >= prev[0]:
                seen[key] = (rnd, ok)
    return seen


# Keys whose implementation changed (or carried a since-fixed defect)
# AFTER their latest green driver check: they jump the rotation like an
# explicitly-recorded failure does, until a CORRECTNESS_r*.json from a
# round NEWER than the mapped value records them passing.  (The round-3
# events.ts cohort was re-shown green in CORRECTNESS_r04 and pruned;
# the as-of family was rewritten to the union+last_value formulation in
# round 5, so its r4 greens predate the current code.)  With the map
# this small, the least-recently-verified ordering pushes the 35 keys
# whose latest check predates the round-3 fixture regeneration — all
# last checked in r2 — through the round-5 budget right behind them.
_MUST_REVERIFY: dict[str, int] = {
    "q_asof_join": 4,
    "q_asof_join_forward": 4,
    "q_asof_join_nearest": 4,
}


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry,
    ordered so the driver's bounded correctness pass spends its budget
    where it matters most: keys whose LATEST driver check failed lead
    (a recorded red must be shown green again as soon as it's fixed),
    alongside _MUST_REVERIFY keys fixed since their last green check,
    then never-verified keys (new this round), then everything else
    least-recently-verified first.  Registration order breaks ties,
    which keeps the ordering deterministic."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    hist = _verification_history()
    names = list(_REGISTRY)
    order = {name: i for i, name in enumerate(names)}

    def sort_key(n: str) -> tuple[int, int]:
        rnd, ok = hist.get(n, (-1, True))
        if n in _MUST_REVERIFY and (n not in hist or rnd <= _MUST_REVERIFY[n]):
            return (-2, order[n])
        return (-2 if not ok else rnd, order[n])

    names.sort(key=sort_key)
    return {name: _REGISTRY[name] for name in names}
