"""Benchmark runner: times every registered query (oracle-checked and
rows-only alike) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
and prints ONE JSON line the driver records as BENCH_r{N}.json.

Each query is executed to completion (collect) on a single shared
SparkSession — session startup is excluded from per-query time but a
cold "first job" warmup is run so JIT/codegen costs don't land on q1.

A query that raises is reported in an ``errors`` list in the JSON line
and makes the process exit nonzero, so a half-broken round can never
masquerade as a faster one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_example_spark.plans.registry import all_specs
from flink_streaming_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("flink-streaming-example-spark-bench")
    specs = all_specs()
    # Warm the JVM: codegen, and the parquet datasource init path (the
    # first parquet job pays several seconds of one-time setup).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    except Exception:
        pass

    timings: dict[str, float] = {}
    errors: list[str] = []
    for name in sorted(specs):
        spec = specs[name]
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, SF_DIR)
            # Full materialization on the driver, via Arrow batch
            # transfer (what any real consumer uses); row-at-a-time
            # collect() would add pure pickling overhead to the timing.
            try:
                df.toPandas()
            except Exception:
                df.collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep timing the rest, but surface it
            timings[name] = -1.0
            errors.append(name)
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "sf": sf,
            }
        )
    )
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
