"""TPC-H-style flagship suite over the star-schema fixture (SURVEY.md
§2.5 J5 / §7 — the end-to-end proof queries a warehouse user actually
runs).  Q1's shape is q_groupby_report (operators/relational.py); this
module adapts the other classics to the fixture's reduced columns
(no l_shipmode/l_commitdate/o_shippriority — filters substituted with
columns the fixture has; same join graphs, same aggregate shapes).

Scale notes (100 TB):
- Broadcast hints go ONLY on true constants (nation, region, the Q18
  qualifying-key aggregate); customer/supplier/part/orders scale with
  the warehouse, so they carry no hint — AQE broadcasts them at
  fixture scale and sort-merge-joins them at 100 TB.  Aggregations
  are planned partial -> final (map-side combine), so shuffle volume
  is group cardinality, not row count.
- Date filters sit directly on the parquet scan (PushedFilters) and
  prune columns to the read set; tests/test_plans.py gates this.
- Top-k with LIMIT uses TakeOrderedAndProject (no global sort): each
  partition keeps k candidates, the driver merges k * partitions rows.
- Determinism at LIMIT boundaries: ORDER BY the stable-rounded
  revenue plus an id tiebreaker, identical in both engines, so the
  selected SET is well-defined (SURVEY.md §5.2 top-k trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.functions.stable import (
    rounded,
    sql_rounded,
    sql_stable_sum,
    sql_stable_sum_expr,
    stable_sum,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEC = "decimal(30,6)"


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


_Q3_CUT = "1998-06-15 00:00:00"
_Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l_shipdate  > TIMESTAMP '{_Q3_CUT}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q_tpch_q3", oracle=_Q3_ORACLE, tags=("tpch", "join"))
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped BUILDING-segment orders
    ranked by open revenue — customer ⨝ orders ⨝ lineitem, top-10 by
    stable-rounded revenue with l_orderkey tiebreaker."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts(_Q3_CUT)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts(_Q3_CUT)
    )
    # orders passes ~half its rows here — a fact, not a dim: no
    # broadcast hint (AQE broadcasts it at fixture scale, sort-merge
    # joins it at 100 TB).  The BUILDING fifth of customer likewise.
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("q_tpch_q4", oracle=_Q4_ORACLE, tags=("tpch", "join"))
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the fixture has no
    l_commitdate/l_receiptdate, so the EXISTS predicate is "some line
    shipped after the order date" — same correlated-semi-join plan
    (LeftSemi with a non-equi conjunct) the original exercises."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q5_ORACLE = f"""
SELECT n_name,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("q_tpch_q5", oracle=_Q5_ORACLE, tags=("tpch", "join"))
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-way star-plus-snowflake
    join with the c_nationkey = s_nationkey locality constraint — the
    hardest join-ordering case in the suite.  nation/region broadcast
    by hint, the scaling relations by AQE's choice; the final
    aggregate shuffles only 5 groups."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    # Hint only the true constants (nation 25 rows, region 5);
    # orders-1996/customer/supplier scale with the warehouse, so AQE
    # picks broadcast at fixture scale and sort-merge at 100 TB.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


_Q6_ORACLE = f"""
SELECT
  {sql_stable_sum("l_extendedprice * l_discount", "revenue")},
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


@register("q_tpch_q6", oracle=_Q6_ORACLE, tags=("tpch",))
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-agg —
    the query that shows whether predicates reach the parquet reader
    (all three filters are pushable min/max range predicates)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        stable_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q_tpch_q10", oracle=_Q10_ORACLE, tags=("tpch", "join"))
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): customers ranked by lost revenue on
    returned lines in a quarter — fact ⨝ three broadcast dims, top-20
    by stable revenue with c_custkey tiebreaker."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q14_ORACLE = f"""
SELECT
  {sql_rounded(
      "(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' "
      "THEN CAST(CAST((l_extendedprice * (1 - l_discount)) AS STRING) "
      "AS DECIMAL(30,6)) "
      "ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)) "
      "/ CAST(SUM(CAST(CAST((l_extendedprice * (1 - l_discount)) AS STRING) "
      "AS DECIMAL(30,6))) AS DOUBLE)",
      "promo_revenue_pct",
      6,
  )}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


@register("q_tpch_q14", oracle=_Q14_ORACLE, tags=("tpch", "join"))
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's
    revenue.  Both sums are exact decimals (order-independent); the
    quotient is IEEE double ops in the same order as the oracle SQL,
    then mirrored half-up rounding — bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        _DEC
    )
    promo = (
        F.when(F.col("p_type") == "PROMO", disc_price)
        .otherwise(F.lit(0).cast(_DEC))
    )
    q = (F.lit(100.0) * F.sum(promo).cast("double")) / F.sum(
        disc_price
    ).cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(rounded(q, "promo_revenue_pct", 6))
    )


_Q18_QTY = 150
_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey,
    {sql_stable_sum("l_quantity", "sum_qty")}
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {sql_stable_sum_expr("l_quantity")} > {_Q18_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


@register("q_tpch_q18", oracle=_Q18_ORACLE, tags=("tpch", "join"))
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds the threshold, enriched with customer/order attributes.
    The HAVING filter compares the stable-rounded decimal sum in both
    engines, so the qualifying SET is deterministic.  The aggregate
    runs FIRST (fact-only shuffle), then the small qualifying key set
    joins orders/customer — at 100 TB the `big` side is tiny and
    broadcast, so no fact-table re-shuffle happens."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(stable_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q_tpch_q7", oracle=_Q7_ORACLE, tags=("tpch", "join"))
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations
    by ship year — the self-join-on-nation case (nation enters twice
    under different roles), with the disjunctive nation-pair predicate
    evaluated after both broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


_Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {sql_rounded(
      "(100.0 * CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' "
      "THEN CAST(CAST((l_extendedprice * (1 - l_discount)) AS STRING) "
      "AS DECIMAL(30,6)) "
      "ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)) "
      "/ CAST(SUM(CAST(CAST((l_extendedprice * (1 - l_discount)) AS STRING) "
      "AS DECIMAL(30,6))) AS DOUBLE)",
      "mkt_share_pct",
      6,
  )}
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
GROUP BY o_year
"""


@register("q_tpch_q8", oracle=_Q8_ORACLE, tags=("tpch", "join"))
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's revenue share of
    PROMO-part sales to one region's customers, per order year — the
    deepest join tree in the suite (8 relations, nation twice).  The
    share is a conditional-decimal-sum quotient, bit-deterministic
    cross-engine as in Q14."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        _DEC
    )
    national = (
        F.when(F.col("supp_nation") == "NATION_3", disc_price)
        .otherwise(F.lit(0).cast(_DEC))
    )
    q = (F.lit(100.0) * F.sum(national).cast("double")) / F.sum(
        disc_price
    ).cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(rounded(q, "mkt_share_pct", 6))
    )


_Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS pk,
    0.2 * (CAST(SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS DOUBLE)
           / COUNT(l_quantity)) AS threshold
  FROM lineitem GROUP BY pk
)
SELECT COUNT(*) AS n_small,
  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS STRING) AS DECIMAL(30,6))), 2) AS DOUBLE)
    AS total_price
FROM lineitem JOIN avg_qty ON l_partkey = pk
WHERE l_quantity < threshold
"""


@register("q_tpch_q17", oracle=_Q17_ORACLE, tags=("tpch", "join"))
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): each line compared
    against 0.2x its part's average quantity — the correlated scalar
    subquery, planned as aggregate-then-rejoin on the fact's own key.
    The threshold is an exact-decimal-sum quotient (order-independent,
    IEEE-identical in both engines) so the boundary comparison is
    deterministic cross-engine.  At 100 TB the per-part aggregate is a
    map-side-combined shuffle on l_partkey and rejoins the fact on the
    same key — with lineitem bucketed by l_partkey both sides
    co-locate and the rejoin is shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
                / F.count("l_quantity")
            )
        ).alias("threshold")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            stable_sum("l_extendedprice", "total_price"),
        )
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("q_tpch_q13", oracle=_Q13_ORACLE, tags=("tpch", "join"))
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT JOIN with a
    residual predicate ON THE JOIN (not a post-filter — that would
    drop no-order customers), then a two-level aggregate: count per
    customer, histogram of counts.  The second aggregate's key space
    is tiny, so the second shuffle is near-free."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
    {sql_stable_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY supplier_no
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@register("q_tpch_q15", oracle=_Q15_ORACLE, tags=("tpch", "join"))
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    the supplier(s) hitting the maximum — the scalar-aggregate
    subquery, planned as a 1-row broadcast cross join against the
    (already small) per-supplier aggregate.  Revenue is stable-rounded
    so the equality against the max picks the same set both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        stable_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q19_ORACLE = f"""
SELECT COUNT(*) AS n_lines,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
"""


@register("q_tpch_q19", oracle=_Q19_ORACLE, tags=("tpch", "join"))
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    predicate spanning both join sides — Catalyst pushes the derived
    per-side envelopes (l_quantity in [1,40], p_brand in the two
    values) below the join and keeps the exact OR as a post-join
    filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
    AS cutoff
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(ROUND(SUM(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(30,6))), 2) AS DOUBLE)
    AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > cutoff
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


@register("q_tpch_q22", oracle=_Q22_ORACLE, tags=("tpch", "join"))
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: above-average-
    balance customers with no RECENT orders (every fixture customer
    has some order, so the original's no-orders-ever set is empty) —
    scalar-average subquery as a 1-row broadcast cross join, then an
    anti join against the recent-orders keys.  The cutoff is an exact
    decimal quotient, deterministic cross-engine."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    )
    cutoff = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("cutoff")
        )
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum("c_acctbal", "totacctbal"),
        )
    )
