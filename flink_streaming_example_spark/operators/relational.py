"""Flagship end-to-end relational query (SURVEY.md §2.3 A5, §7 M1).

The TPC-H-Q1-shaped pricing summary over ``lineitem``: scan → pushed
filter → project → partial+final hash aggregate → sort.  This is the
Flink `keyBy(...).aggregate(...)` pattern ([F `KeyedStream#aggregate`])
expressed as a batch DataFrame; the streaming variant of the same
expression tree lives in streaming/queries.py.

Scale notes: the filter and the 7-column projection reach the parquet
scan (PushedFilters/ReadSchema verified in tests/test_plans.py); the
aggregate is a map-side partial HashAggregate before the single shuffle
on the 6-value grouping key; no Python leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_stable_sum("l_quantity", "sum_qty")},
  {sql_stable_sum("l_extendedprice", "sum_base_price")},
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_stable_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {sql_stable_avg("l_quantity", "avg_qty")},
  {sql_stable_avg("l_extendedprice", "avg_price")},
  {sql_stable_avg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_groupby_report", oracle=_Q1_ORACLE, tags=("agg", "flagship"))
def q_groupby_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: multi-aggregate group report (TPC-H Q1 shape) over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity", "sum_qty"),
            stable_sum("l_extendedprice", "sum_base_price"),
            stable_sum(disc_price, "sum_disc_price"),
            stable_sum(charge, "sum_charge"),
            stable_avg("l_quantity", "avg_qty"),
            stable_avg("l_extendedprice", "avg_price"),
            stable_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_TOPN_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
    CAST(SUM(CAST(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6))
                  * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT mon, o_custkey, cents,
    ROW_NUMBER() OVER (PARTITION BY mon
                       ORDER BY cents DESC, o_custkey) AS rnk
  FROM rev
)
SELECT mon, CAST(rnk AS BIGINT) AS rnk,
  o_custkey AS custkey, cents
FROM ranked WHERE rnk <= 3
"""


@register("q_sql_topn", oracle=_SQL_TOPN_ORACLE, tags=("relational",))
def q_sql_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the engine's surface is not only the
    DataFrame API — this key runs a multi-CTE SQL TEXT query
    (aggregate -> window -> filter, the top-3-customers-per-month
    leaderboard) through spark.sql() against a registered temp view,
    proving text queries plan through the identical Catalyst path
    (same pushdown, same partial aggregates) as the DataFrame keys.
    Cents are exact via the decimal cast; the rank tiebreak is total
    (cents DESC, custkey), so both engines elect identical top
    rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_sql_v"
    )
    return spark.sql(
        """
        WITH rev AS (
          SELECT o_custkey,
            date_format(date_trunc('month', o_orderdate), 'yyyy-MM')
              AS mon,
            CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,6)) * 100
                          AS BIGINT)) AS BIGINT) AS cents
          FROM orders_sql_v GROUP BY 1, 2
        ), ranked AS (
          SELECT mon, o_custkey, cents,
            ROW_NUMBER() OVER (PARTITION BY mon
                               ORDER BY cents DESC, o_custkey) AS rnk
          FROM rev
        )
        SELECT mon, CAST(rnk AS BIGINT) AS rnk,
          o_custkey AS custkey, cents
        FROM ranked WHERE rnk <= 3
        """
    )


_PROFILE_COLS = ("user_id", "event_type", "value", "props")

_DATA_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{c}' AS column_name,
  CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM events"""
    for c in _PROFILE_COLS
)


def profile_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """The profiling kernel behind q_data_profile (factored so the
    null-count path is unit-testable — the parity fixture carries no
    NULLs): one aggregation computing exact null count + exact
    distinct cardinality for every column (Catalyst compiles the
    multi-count-distinct into a single Expand pass; COUNT DISTINCT
    ignores NULLs, matching SQL), stacked to long-form rows."""
    prof = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
            for c in cols
        ],
        *[F.countDistinct(F.col(c)).alias(f"nd_{c}") for c in cols],
    )
    stacked = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return prof.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, n_nulls, n_distinct)"
    )


@register("q_data_profile", oracle=_DATA_PROFILE_ORACLE, tags=("relational",))
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile audit (the Deequ/Great-Expectations primitive a
    pipeline runs before trusting a new table): per column, exact
    null count and exact distinct cardinality, emitted long-form as
    (column_name, n_nulls, n_distinct).  Kernel and its one-Expand
    plan story live in profile_columns().  At 100 TB swap the exact
    distincts for approx_count_distinct to drop the Expand
    multiplier; exact is kept here because the oracle hash-checks the
    cardinalities."""
    ev = load_table(spark, sf_dir, "events")
    return profile_columns(ev, _PROFILE_COLS)
