"""Cross-engine parity of functions/stable.py on adversarial floats —
halfway rounding values and order-sensitive sums, beyond what the
fixtures happen to contain."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from flink_streaming_example_spark.functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from flink_streaming_example_spark.testing import compare_frames


@pytest.fixture(scope="module")
def frame() -> pd.DataFrame:
    rng = random.Random(42)
    vals, keys = [], []
    # Halfway-round candidates (the Spark-vs-DuckDB ROUND divergence
    # class: shortest-repr vs exact-binary rounding), plus noise.
    for i in range(400):
        k = i % 7
        if i % 4 == 0:
            v = round(rng.uniform(0, 1000), 2) + 0.005  # x.xx5 halfway
        elif i % 4 == 1:
            v = rng.uniform(-1e6, 1e6)
        elif i % 4 == 2:
            v = rng.uniform(0, 1e-4)
        else:
            v = float(rng.randint(0, 10**9)) / 100.0
        vals.append(v)
        keys.append(k)
    return pd.DataFrame({"k": keys, "v": vals})


def test_stable_sum_avg_parity(spark, frame):
    sdf = spark.createDataFrame(frame)
    got = (
        sdf.groupBy("k")
        .agg(stable_sum("v", "s"), stable_avg("v", "a"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", frame)
    want = con.execute(
        f"SELECT k, {sql_stable_sum('v', 's')}, {sql_stable_avg('v', 'a')} "
        "FROM t GROUP BY k"
    ).df()
    result = compare_frames(got, want)
    assert result.ok, result.detail


def test_stable_sum_is_order_independent(spark, frame):
    sdf = spark.createDataFrame(frame)
    fwd = sdf.groupBy("k").agg(stable_sum("v", "s")).toPandas()
    rev = (
        spark.createDataFrame(frame.iloc[::-1])
        .repartition(13)
        .groupBy("k")
        .agg(stable_sum("v", "s"))
        .toPandas()
    )
    result = compare_frames(fwd, rev)
    assert result.ok, result.detail
