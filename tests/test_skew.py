"""AQE skew-join handling — at 100 TB a hot key (one user, one
document cluster) concentrates a shuffle partition; AQE must split the
skewed partition instead of letting one reducer run the whole join.
Thresholds are scoped down so the fixture-scale skew triggers the same
code path production relies on."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 200k-row fact where one key owns 70% of rows, vs a 1k-row dim
    # forced into a sort-merge join (broadcast disabled above)
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 7, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    joined = fact.join(dim, "k")
    # materialize THIS DataFrame's own query execution: count() would
    # plan a separate query, and explain() on an unexecuted frame shows
    # isFinalPlan=false without any AQE rewrites
    n = len(joined.collect())
    assert n == 200_000
    # AQE rewrites the executed plan; the skew handling is visible as
    # skew=true on the SortMergeJoin of the FINAL adaptive plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE skew join did not engage:\n{plan}"
