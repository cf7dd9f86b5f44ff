"""Co-located join via bucketing — the 100 TB answer to the one
fact-fact shuffle in the engine (lineitem⋈orders, SURVEY §4 /
operators/joins.py scale notes).

Writes both fact tables bucketed by the join key into a throwaway
warehouse, then asserts the bucketed join plans WITHOUT a shuffle
exchange on either side — the concrete proof behind the 'bucket both
sides on orderkey' claim."""

from __future__ import annotations

import contextlib
import io
import re
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    warehouse = tempfile.mkdtemp(prefix="bucketed_wh_")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        table = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            load_table(spark, SF_DIR, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{warehouse}/{table}")
            .saveAsTable(table)
        )
    yield spark
    for name in ("lineitem", "orders"):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")
    shutil.rmtree(warehouse, ignore_errors=True)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    li = spark.table("bkt_lineitem")
    # merge hint: at fixture scale Spark would otherwise broadcast the
    # tiny orders side; at real scale SMJ is what the planner picks
    orders = spark.table("bkt_orders").hint("merge")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the whole point: no Exchange feeding the join — both sides read
    # pre-bucketed on the key
    assert "Exchange" not in join_section, join_section
    # and the result is still correct
    rows = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    li_cnt = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(rows.values()) == li_cnt


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join over plain parquet shuffles both sides
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").hint("merge")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = _plan(joined)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) >= 2
