"""Stateless row transforms (SURVEY.md §2.2 T1-T7).

The Flink DataStream one-to-one/one-to-many surface — `map`, `flatMap`,
`filter`, parse-map, `union`, `connect`, side outputs ([F
`DataStream#map/flatMap/filter/union/connect`], SURVEY.md §2.2) —
re-expressed as Catalyst expressions so every transform stays inside
whole-stage codegen: projections are `select`, flatMap is
`explode(split(...))`, the parse-map is `from_json`, and
connect/side-outputs are modeled as tag-and-union / filter-and-union
(no Spark equivalent of a two-input chained operator exists, and none
is needed — the union plan fuses into the same scan pipeline).

Scale notes (100 TB): all seven are narrow transforms except the unions,
which are also shuffle-free (union is a logical concat of partitions).
Filters and projections reach the parquet scan (PushedFilters/ReadSchema
asserted in tests/test_plans.py); nothing here shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.functions.stable import (
    rounded,
    sql_rounded,
    sql_stable_sum,
    stable_sum,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_PROJECT_ORACLE = f"""
SELECT
  l_orderkey,
  l_linenumber,
  l_quantity,
  {sql_rounded("l_extendedprice * (1 - l_discount)", "net_price")}
FROM lineitem
"""


@register("q_project", oracle=_PROJECT_ORACLE, tags=("transform",))
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: map/projection — 1->1 computed-column transform."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        rounded(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net_price"),
    )


_FLATMAP_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
"""


@register("q_flatmap_tokens", oracle=_FLATMAP_ORACLE, tags=("transform",))
def q_flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: flatMap — the classic 1->N tokenize (explode keeps codegen;
    a Python UDTF would leave the JVM for no reason)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
FROM lineitem
WHERE (l_returnflag IN ('A', 'R')
       AND l_quantity BETWEEN 10 AND 20
       AND l_shipdate >= TIMESTAMP '1996-01-01')
   OR (l_discount < 0.02 AND l_tax > 0.06)
"""


@register("q_filter", oracle=_FILTER_ORACLE, tags=("transform",))
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: filter — composite predicate (IN / BETWEEN / AND / OR);
    the whole disjunction is pushed to the parquet row-group level."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
    ) | ((F.col("l_discount") < 0.02) & (F.col("l_tax") > 0.06))
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount"
    )


_PARSE_ORACLE = """
SELECT
  event_id,
  event_type,
  json_extract(props, '$.k')::INTEGER AS k_val
FROM events
"""


@register("q_parse_json_props", oracle=_PARSE_ORACLE, tags=("transform",))
def q_parse_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: type-parsing map — the Kafka-style parse step (`from_json`
    with an explicit schema, never inference)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k_val"),
    )


_UNION_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type = 'purchase' AND value > 100
UNION ALL
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type = 'signup'
"""


@register("q_union", oracle=_UNION_ORACLE, tags=("transform",))
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: union of two same-schema streams (unionByName: position-safe)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    big_purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    ).select(*cols)
    signups = ev.filter(F.col("event_type") == "signup").select(*cols)
    return big_purchases.unionByName(signups)


_CONNECT_ORACLE = f"""
SELECT src, COUNT(*) AS n, {sql_stable_sum("amount", "total")}
FROM (
  SELECT 'order' AS src, o_totalprice AS amount FROM orders
  UNION ALL
  SELECT 'line' AS src, l_extendedprice AS amount FROM lineitem
)
GROUP BY src
"""


@register("q_connect_tagged", oracle=_CONNECT_ORACLE, tags=("transform",))
def q_connect_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: connect/CoMap — two differently-typed streams through one
    operator, modeled as discriminator-tagged union (SURVEY §2.2 T6)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    tagged = orders.select(
        F.lit("order").alias("src"), F.col("o_totalprice").alias("amount")
    ).unionByName(
        li.select(F.lit("line").alias("src"), F.col("l_extendedprice").alias("amount"))
    )
    return tagged.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"), stable_sum("amount", "total")
    )


_SPLIT_ORACLE = """
SELECT
  event_id,
  CASE WHEN event_type = 'error' THEN 'errors' ELSE 'main' END AS split
FROM events
"""


@register("q_split_streams", oracle=_SPLIT_ORACLE, tags=("transform",))
def q_split_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: side outputs — one parent split into N filtered children
    (re-unioned with a tag here so the whole split is one checkable
    result; streaming variant would route each child via foreachBatch)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.lit("errors").alias("split")
    )
    main = ev.filter(F.col("event_type") != "error").select(
        "event_id", F.lit("main").alias("split")
    )
    return errors.unionByName(main)
