"""TPC-H completion suite — the eight classics operators/tpch.py left
out (Q1, Q2, Q9, Q11, Q12, Q16, Q20, Q21), finishing all 22 (SURVEY.md
§2.5 J5 / §7 flagship proof).

The fixture has no `partsupp` table; wherever the original needs it,
the distinct `(l_partkey, l_suppkey)` pairs of `lineitem` stand in
(51.7k pairs at sf0.01 — same key structure, same join role), and
`ps_supplycost` / `ps_availqty` / comment-based filters are replaced
with columns the fixture has (s_acctbal, shipped-quantity sums,
shipdate-vs-orderdate lateness).  Join graphs, subquery shapes
(correlated scalar, nested semi, EXISTS/NOT-EXISTS pair) and aggregate
shapes are preserved — that is what the suite exercises.

Scale notes (100 TB):
- The derived partsupp is a fact-sized DISTINCT: a map-side-combined
  shuffle on (l_partkey, l_suppkey).  With lineitem bucketed by
  l_partkey the downstream part joins co-locate.  A real deployment
  would materialize it once, bucketed, instead of deriving per query.
- Broadcast hints only on true constants (nation, region, the 1-row
  scalar aggregates).  supplier/part/orders scale with the warehouse:
  AQE broadcasts them at fixture scale, sort-merge-joins at 100 TB.
- Q21's EXISTS / NOT-EXISTS pair is planned as ONE aggregation over
  the order key (distinct-supplier and distinct-late-supplier counts
  per order), not two correlated re-scans of lineitem — the oracle
  keeps the textbook EXISTS formulation to pin equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.functions.stable import (
    rounded,
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEC = "decimal(30,6)"


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's stand-in for partsupp: distinct supply pairs."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )


_PARTSUPP_SQL = """
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
"""


_Q1_CUT = "2001-09-01 00:00:00"
_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
  {sql_stable_sum("l_quantity", "sum_qty")},
  {sql_stable_sum("l_extendedprice", "sum_base_price")},
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_stable_sum(
      "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"
  )},
  {sql_stable_avg("l_quantity", "avg_qty")},
  {sql_stable_avg("l_extendedprice", "avg_price")},
  {sql_stable_avg("l_discount", "avg_disc", 6)},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUT}'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_tpch_q1", oracle=_Q1_ORACLE, tags=("tpch",))
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report), the full eight-aggregate
    version (q_groupby_report in operators/relational.py is the
    reduced flagship cut).  Single scan, filter and 7-column
    projection pushed to parquet, partial->final HashAggregate on a
    handful of (returnflag, linestatus) groups — shuffle volume is
    group cardinality regardless of input size, the canonical
    100 TB-safe aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts(_Q1_CUT)
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity", "sum_qty"),
            stable_sum("l_extendedprice", "sum_base_price"),
            stable_sum(disc_price, "sum_disc_price"),
            stable_sum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            stable_avg("l_quantity", "avg_qty"),
            stable_avg("l_extendedprice", "avg_price"),
            stable_avg("l_discount", "avg_disc", 6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q2_TYPE = "STANDARD"
_Q2_ORACLE = f"""
WITH ps AS ({_PARTSUPP_SQL}),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT ps_partkey AS bk, MAX(s_acctbal) AS best_bal
  FROM ps JOIN eu ON ps_suppkey = s_suppkey
  GROUP BY bk
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN ps   ON p_partkey = ps_partkey
JOIN eu   ON ps_suppkey = s_suppkey
JOIN best ON p_partkey = bk AND s_acctbal = best_bal
WHERE p_type = '{_Q2_TYPE}'
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 20
"""


@register("q_tpch_q2", oracle=_Q2_ORACLE, tags=("tpch", "join"))
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: for each STANDARD
    part, the EUROPE supplier with the best account balance (the
    fixture has no ps_supplycost; MAX(s_acctbal) keeps the correlated
    scalar subquery role).  The correlated subquery is a PARTITIONED
    window max computed in place — one pass over the supply pairs,
    one exchange on the part key — where the textbook
    aggregate-then-rejoin references the supply-pair subtree twice
    and physically re-derives it from lineitem (2 fact scans; caught
    by the de-vacuumed test_fact_scanned_once in round 11).  Ties on
    (partkey, acctbal) keep all rows, as the original does; ORDER BY
    carries p_partkey + s_name tiebreakers so the LIMIT set is
    deterministic."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q2_TYPE
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    supplied = ps.join(eu, ps.ps_suppkey == eu.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    return (
        supplied.withColumn("best_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .join(part, F.col("ps_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(20)
    )


_Q9_ORACLE = f"""
SELECT n_name AS nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {sql_stable_sum("l_extendedprice * (1 - l_discount)", "sum_profit")}
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""


@register("q_tpch_q9", oracle=_Q9_ORACLE, tags=("tpch", "join"))
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit on red parts by
    supplier nation and order year (no ps_supplycost in the fixture,
    so profit is revenue: extendedprice x (1 - discount) — same 5-way
    join graph, same group-by shape).  The p_name LIKE 'red%' filter
    prunes part before the join; lineitem joins part, supplier, orders
    on its own keys, nation broadcast — one fact-table pass."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_profit",
            )
        )
    )


_Q11_FRACTION = 0.001
_Q11_ORACLE = f"""
WITH val AS (
  SELECT l_partkey AS ps_partkey,
    SUM(CAST(CAST((l_extendedprice * (1 - l_discount)) AS STRING) AS DECIMAL(30,6))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY ps_partkey
)
SELECT ps_partkey,
  CAST(ROUND(v, 2) AS DOUBLE) AS value
FROM val, (SELECT CAST(SUM(v) AS DOUBLE) * {_Q11_FRACTION} AS threshold
           FROM val)
WHERE CAST(v AS DOUBLE) > threshold
"""


@register("q_tpch_q11", oracle=_Q11_ORACLE, tags=("tpch", "join"))
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: per-part
    revenue supplied through EUROPE suppliers, keeping parts above a
    fraction of the whole region's total (no ps_supplycost x
    ps_availqty; discounted revenue is the value measure — same
    group-by + global-scalar-threshold shape).  The per-part aggregate
    is one map-side-combined shuffle; the grand total reuses it and
    joins back as a 1-row broadcast.  Both engines compare IEEE
    doubles cast from the same exact decimal sums, so the qualifying
    set is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    _DEC
                )
            ).alias("v")
        )
    )
    threshold = val.agg(
        (F.sum("v").cast("double") * F.lit(_Q11_FRACTION)).alias("threshold")
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("v").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey",
            F.round(F.col("v"), 2).cast("double").alias("value"),
        )
    )


_Q12_LATE_DAYS = 90
_Q12_ORACLE = f"""
SELECT l_linestatus AS ship_class,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
GROUP BY ship_class
"""


@register("q_tpch_q12", oracle=_Q12_ORACLE, tags=("tpch", "join"))
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: 1997
    shipments more than 90 days after their order date, classified by
    l_linestatus (the fixture has no l_shipmode/l_commitdate/
    l_receiptdate; shipdate-vs-orderdate lateness keeps the
    cross-table date predicate, linestatus the mode role).  Same
    conditional-aggregate shape: one join, CASE sums split by
    priority.  The shipdate range prunes the scan; the lateness
    predicate is a post-join filter by construction (it spans both
    sides)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAY")
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 23)
_Q16_ORACLE = f"""
WITH ps AS ({_PARTSUPP_SQL})
SELECT p_brand, p_type, p_size,
  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN {_Q16_SIZES}
  AND ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q_tpch_q16", oracle=_Q16_ORACLE, tags=("tpch", "join"))
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: supplier
    variety per (brand, type, size) over the derived supply pairs,
    excluding negative-balance suppliers (the fixture has no s_comment
    for the complaints filter; the NOT-IN-subquery shape is what
    matters, planned as a broadcast anti join — suppkey is non-null so
    NOT IN and ANTI agree).  COUNT(DISTINCT) over the pair table
    shuffles once on the group key; the part filters prune before the
    join."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(part, ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


_Q20_FRACTION = 0.3
_Q20_ORACLE = f"""
WITH shipped97 AS (
  SELECT l_partkey AS pk,
    SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS part_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY pk
),
pair_qty AS (
  SELECT l_partkey, l_suppkey,
    SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS supplied
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'blue%'
  GROUP BY l_partkey, l_suppkey
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN pair_qty  ON l_suppkey = s_suppkey
JOIN shipped97 ON l_partkey = pk
WHERE CAST(supplied AS DOUBLE) > {_Q20_FRACTION} * CAST(part_qty AS DOUBLE)
"""


@register("q_tpch_q20", oracle=_Q20_ORACLE, tags=("tpch", "join"))
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: suppliers who
    dominate a blue part — their all-time shipped quantity for the
    part exceeds 30% of the part's total 1997 volume (no ps_availqty;
    the shipped-quantity sums keep the original's
    aggregate-vs-correlated-aggregate comparison, and the nested-IN
    chain becomes the semi-join it would be planned as).  Two
    map-side-combined aggregates over the fact, equi-joined on the
    part key, then a DISTINCT projection to supplier grain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("blue")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped97 = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("part_qty"))
    )
    pair_qty = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("supplied"))
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(pair_qty, F.col("l_suppkey") == supp.s_suppkey)
        .join(shipped97, F.col("l_partkey") == F.col("pk"))
        .filter(
            F.col("supplied").cast("double")
            > F.lit(_Q20_FRACTION) * F.col("part_qty").cast("double")
        )
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


_Q21_LATE_DAYS = 90
_Q21_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
    l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@register("q_tpch_q21", oracle=_Q21_ORACLE, tags=("tpch", "join"))
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted:
    finished orders where exactly one supplier shipped late (>90 days
    after the order date — the fixture's stand-in for receipt >
    commit) while other suppliers were involved; late lines counted
    per supplier.  The oracle keeps the textbook EXISTS / NOT-EXISTS
    pair; the Spark plan folds BOTH correlated subqueries into ONE
    aggregation over the order key (distinct suppliers, distinct late
    suppliers, late-line count) — one fact shuffle instead of two
    correlated re-scans, the formulation that survives 100 TB.  Top-25
    with s_name tiebreaker (names are unique) so the LIMIT set is
    deterministic."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAY"
    )
    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "waiting_supp"
        ),
        F.sum(F.when(F.col("late"), 1).otherwise(0))
        .cast("long")
        .alias("n_late_lines"),
    )
    return (
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(supp, F.col("waiting_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )
