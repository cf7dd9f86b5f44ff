"""SparkSession construction and required runtime confs.

Scale posture (SURVEY.md §4, §6): AQE on (runtime re-planning, skew-join
handling, partition coalescing), shuffle partitions sized to the local
core count instead of the 200 default (on a real cluster this would be
2-3x total executor cores), Arrow enabled for any pandas interchange,
session timezone pinned to UTC so timestamp semantics match the DuckDB
oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that MUST hold on any session our queries run on, including a
# driver-provided session we didn't build.  All of these are runtime-settable
# SQL confs (not static Spark confs), so ensure_session_confs() can apply
# them to a live session.
_REQUIRED_SQL_CONFS: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark cannot read
    # natively ([PARQUET_TYPE_ILLEGAL]); read as epoch-nanos long and
    # convert explicitly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics matching the tz-naive oracle.
    "spark.sql.session.timeZone": "UTC",
    # Let AQE pick runtime plans (coalesce post-shuffle partitions,
    # SMJ->BHJ conversion, skew-join splitting).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow for every pandas/Python interchange path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent).

    Called defensively by the table loader so queries behave identically
    on the driver's own SparkSession.
    """
    for k, v in _REQUIRED_SQL_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf missing in future Spark
            pass
    # Shuffle sizing: at local test scale the 200 default just adds task
    # scheduling overhead; on a cluster this should be ~2x total cores.
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 4 * _cpus():
            spark.conf.set("spark.sql.shuffle.partitions", str(_cpus()))
    except Exception:  # pragma: no cover
        pass
    return spark


def get_spark(app_name: str = "flink-streaming-example-spark") -> SparkSession:
    """Build (or get) a SparkSession configured for this engine."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        # local[N] puts driver AND all executor threads in ONE JVM.
        # The LIBRARY default stays 8g (round-12 ADVICE: get_spark is
        # the shared entry point, and a 16g default can fail or swap
        # on hosts smaller than the 128 GiB bench machine); the
        # storage pressure that motivated 16g is specific to the
        # 261-key single-JVM bench sweep, so bench.py requests the
        # larger heap itself via SPARK_DRIVER_MEMORY.  Irrelevant on a
        # real cluster where executors size their own heaps.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in _REQUIRED_SQL_CONFS.items():
        builder = builder.config(k, v)
    return ensure_session_confs(builder.getOrCreate())
