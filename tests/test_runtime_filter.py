"""Runtime bloom-filter join pruning (the 100 TB posture check next to
tests/test_skew.py's AQE skew-join proof).

On a real cluster, a selective dimension-side filter should cut the
fact-side shuffle BEFORE the join: Spark injects a bloom filter built
from the filtered creation side and applies it as a semi-join reduction
on the fact scan.  The conf is on by default but gated by a 10 GiB
application-side scan threshold, so fixture-scale runs never exercise
it — this test scopes the thresholds down and proves (a) the filter is
actually injected into the physical plan and (b) results are identical
with and without it.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_SCOPED = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # bloom injection targets shuffle joins; keep AQE from broadcasting
    # the dim side away at this scale
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _scoped_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _urgent_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)"))
            .cast("double")
            .alias("qty"),
        )
    )


def test_bloom_filter_injected_and_result_identical(spark):
    baseline = {tuple(r) for r in _urgent_join(spark).collect()}
    with _scoped_confs(spark, _SCOPED):
        df = _urgent_join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan, (
            "runtime bloom filter was not injected under scoped thresholds:\n"
            + plan[:2000]
        )
        got = {tuple(r) for r in df.collect()}
    assert got == baseline
