"""Keyed aggregations (SURVEY.md §2.3 A1-A4, A6).

The Flink `keyBy(...).sum/min/max/reduce/aggregate(...)` family ([F
`KeyedStream#sum/reduce/aggregate`]) as Catalyst hash aggregates.
Catalyst automatically produces Flink's partial+final aggregation shape
(map-side partial HashAggregate -> shuffle on the grouping key -> final
HashAggregate), so the shuffle carries one row per (partition, key) —
the right plan at any scale.

Determinism: double sums/avgs go through functions/stable.py (exact
decimal summation — order-independent, so executor merge order can't
change the hash).  The reduce (A2) picks its survivor via a total
struct order (value, event_id), never "first seen".

Scale notes (100 TB): grouping keys here are low-cardinality (users,
event types, flag pairs) — shuffle volume is bounded by key count, not
input size.  count_distinct(user_id) shuffles one row per (type, user)
pair after partial dedup; for unbounded-cardinality keys switch to
approx_count_distinct (HLL++), which stays mergeable and fixed-size.
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

_KEYED_AGG_ORACLE = f"""
SELECT
  user_id,
  COUNT(*) AS n_events,
  {sql_stable_sum("value", "sum_value")},
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
GROUP BY user_id
"""


@register("q_keyed_agg", oracle=_KEYED_AGG_ORACLE, tags=("agg",))
def q_keyed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: keyBy + rolling sum/min/max — the canonical Flink
    `keyBy(k).sum(v)` as a hash aggregate (min/max of doubles are exact
    order-free values; only the sum needs decimal stabilization)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        stable_sum("value", "sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_REDUCE_ORACLE = """
SELECT user_id, value AS max_value, event_id AS max_event_id
FROM (
  SELECT user_id, value, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id DESC
         ) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("q_keyed_reduce", oracle=_REDUCE_ORACLE, tags=("agg",))
def q_keyed_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: keyBy + reduce — argmax as an associative reduce.  The
    reduction function is `max` over the struct (value, event_id): a
    commutative-associative merge (exactly what Flink requires of
    `reduce`), with the event_id tiebreaker making the survivor
    deterministic.  Stays a hash aggregate — no window/sort needed."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("value", "event_id")).alias("m"))
        .select(
            "user_id",
            F.col("m.value").alias("max_value"),
            F.col("m.event_id").alias("max_event_id"),
        )
    )


_AVG_ORACLE = f"""
SELECT
  event_type,
  COUNT(*) AS n_events,
  {sql_stable_avg("value", "avg_value")}
FROM events
GROUP BY event_type
"""


@register("q_avg_per_key", oracle=_AVG_ORACLE, tags=("agg",))
def q_avg_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: AggregateFunction (running average) — Flink's
    createAccumulator/add/merge/getResult is exactly Catalyst's
    partial/merge/final agg; avg stabilized via exact decimal sum."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), stable_avg("value", "avg_value")
    )


_COUNT_DISTINCT_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@register("q_count_distinct", oracle=_COUNT_DISTINCT_ORACLE, tags=("agg",))
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: count / count distinct per key.  Exact distinct expands to a
    two-phase plan (partial dedup before the shuffle); at unbounded key
    cardinality prefer approx_count_distinct — same query shape, HLL
    sketch merge instead of a dedup shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


_SALTED_ORACLE = f"""
SELECT
  event_type,
  {sql_stable_sum("value", "sum_value")},
  COUNT(*) AS n_rows,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


@register("q_keyed_agg_salted", oracle=_SALTED_ORACLE, tags=("agg",))
def q_keyed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-skew: the same keyed aggregate as A1, executed through the
    salted two-phase plan (functions/skew.py) — partial per
    (key, salt16) then merge per key, splitting a hot key across 16
    reducers.  event_type is exactly such a hot key (5 values over the
    whole table).  The oracle is the PLAIN group-by: associativity
    means salting must not change a single value."""
    from flink_streaming_example_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(ev, "event_type", "event_id", 16).sum_count_min_max(
        "value"
    )
    return out.select(
        "event_type",
        F.col("sum_value"),
        "n_rows",
        F.col("min_value"),
        F.col("max_value"),
    )


_STATS_ORACLE = """
SELECT
  event_type,
  quantile_cont(value, 0.5) AS median_value,
  quantile_cont(value, 0.9) AS p90_value,
  CAST(FLOOR(sqrt(
    (CAST(SUM(CAST(CAST((value * value) AS STRING) AS DECIMAL(30,6))) AS DOUBLE)
     - CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(30,6))) AS DOUBLE)
       * CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value))
    / (COUNT(value) - 1)
  ) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS stddev_value
FROM events
GROUP BY event_type
"""


@register("q_stats", oracle=_STATS_ORACLE, tags=("agg",))
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family depth: exact interpolated percentiles (median/p90 —
    Spark `percentile` and DuckDB `quantile_cont` share the continuous
    interpolation definition, and interpolating between two exact
    parquet doubles is deterministic IEEE math) and a sample stddev
    assembled from ORDER-FREE decimal sums — the builtin stddev
    accumulates floats in partition order and is not hash-stable, so
    it's rebuilt from sum(x), sum(x^2), n.  Exact percentile needs a
    per-key sort; at unbounded scale switch to approx_percentile
    (t-digest sketch, mergeable)."""
    ev = load_table(spark, sf_dir, "events")
    sum_x = F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
    sum_x2 = F.sum(
        (F.col("value") * F.col("value")).cast("decimal(30,6)")
    ).cast("double")
    n = F.count(F.col("value"))
    var = (sum_x2 - sum_x * sum_x / n) / (n - 1)
    return ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), 0.5).alias("median_value"),
        F.percentile(F.col("value"), 0.9).alias("p90_value"),
        (
            F.floor(F.sqrt(var) * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0)
        ).alias("stddev_value"),
    )


_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n,
  {sql_stable_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("q_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: rollup — hierarchical grouping sets (flag, flag+status,
    grand total) in one pass; Catalyst plans a single Expand + agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), stable_sum("l_quantity", "sum_qty")
    )


@register("q_approx_distinct", oracle=None, tags=("agg", "approx"))
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-approx: per-key approx_count_distinct (HyperLogLog++, rsd
    2%) next to the exact count — the 100 TB form of count distinct:
    a fixed-size sketch merge replaces the partial-dedup shuffle, so
    memory stays constant however many distinct users a key has.

    Rows-only key: the HLL estimate is deterministic for a given input
    and rsd but engine-specific, so no DuckDB twin exists; the
    accuracy contract (estimate within 5x rsd of exact on every key)
    is asserted in tests/test_parity.py::test_approx_distinct_accuracy."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users_exact"),
        F.approx_count_distinct(F.col("user_id"), rsd=0.02).alias(
            "n_users_approx"
        ),
    )


@register("q_approx_quantiles", oracle=None, tags=("agg", "approx"))
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-sketch: per-key approx_percentile (Greenwald-Khanna, accuracy
    10000 -> 1e-4 rank error) for p50/p90/p99 of order totals, next to
    the exact interpolated percentile — the 100 TB quantile form: a
    bounded-size mergeable sketch instead of a global sort.

    Rows-only key (the GK summary is engine-specific); the accuracy
    contract — every approx quantile within the value span of ranks
    p±1e-2 of the exact distribution — is asserted in
    tests/test_parity.py::test_approx_quantiles_accuracy."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx_q"),
        F.expr(
            "percentile(o_totalprice, array(0.5, 0.9, 0.99))"
        ).alias("exact_q"),
    ).select(
        "o_orderpriority",
        "n_orders",
        F.col("approx_q")[0].alias("p50_approx"),
        F.col("approx_q")[1].alias("p90_approx"),
        F.col("approx_q")[2].alias("p99_approx"),
        F.col("exact_q")[0].alias("p50_exact"),
        F.col("exact_q")[1].alias("p90_exact"),
        F.col("exact_q")[2].alias("p99_exact"),
    )


# Exact type-1 quantiles by INTEGER rank arithmetic: the target rank
# is ceil(p*n) computed as (num*n + den - 1) // den, never p*n in
# doubles (0.9 * 10 is 9.000000000000002 in IEEE — a float ceil would
# off-by-one on exact multiples), and the selected value is an ACTUAL
# data value at a deterministic total order (value, key tiebreak) —
# no interpolation, so nothing for two engines to round differently.
_PCTL_RANKS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

_PCTL_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
  CAST(MAX(n) AS BIGINT) AS n_orders,
  {", ".join(
      f"MAX(CASE WHEN rn = ({num} * n + {den - 1}) // {den} "
      f"THEN o_totalprice END) AS {label}"
      for label, num, den in _PCTL_RANKS
  )}
FROM ranked
GROUP BY o_orderpriority
"""


@register("q_percentile_exact", oracle=_PCTL_ORACLE, tags=("agg",))
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-depth: exact p50/p90/p99 of order totals per priority — the
    bit-exact twin of q_approx_quantiles' GK sketch, via type-1
    (discrete) quantiles at integer ranks (comment above: no float
    rank arithmetic, no interpolation — the two places exact
    quantiles drift across engines).  Plan: one window sort per
    priority group then a 5-group conditional aggregate.  At 100 TB
    the per-key sort is the cost ceiling and the GK sketch is the
    right default; this key is the audit tool you run on the slice
    where the sketch's error bound isn't good enough."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_orders")]
    for label, num, den in _PCTL_RANKS:
        # integer DIV keeps the ceil computation out of doubles
        target = F.expr(f"(n * {num} + {den - 1}) div {den}")
        aggs.append(
            F.max(
                F.when(F.col("rn") == target, F.col("o_totalprice"))
            ).alias(label)
        )
    return ranked.groupBy("o_orderpriority").agg(*aggs)


_CUBE_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
  COUNT(*) AS n,
  {sql_stable_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q_cube", oracle=_CUBE_ORACLE, tags=("agg",))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: cube — all 2^k grouping sets in one Expand + agg pass, with
    explicit grouping() markers so NULL-as-subtotal is distinguishable
    from NULL-as-value (the standard rollup/cube ambiguity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        stable_sum("l_quantity", "sum_qty"),
    )


_GROUPING_SETS_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n,
  {sql_stable_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register("q_grouping_sets", oracle=_GROUPING_SETS_ORACLE, tags=("agg",))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: explicit GROUPING SETS — the general form rollup/cube are
    sugar for; Spark only exposes it through SQL, so the loaded table
    is registered as a temp view and the query is declared in SQL
    (same Catalyst Expand plan as rollup/cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        f"""
        SELECT
          l_returnflag,
          l_linestatus,
          COUNT(*) AS n,
          {sql_stable_sum("l_quantity", "sum_qty")}
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_PIVOT_ORACLE = """
SELECT source,
  COUNT(CASE WHEN lang = 'de' THEN 1 END) AS n_de,
  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
  COUNT(CASE WHEN lang = 'es' THEN 1 END) AS n_es,
  COUNT(CASE WHEN lang = 'fr' THEN 1 END) AS n_fr,
  COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS n_zh
FROM documents
GROUP BY source
"""

_LANGS = ["de", "en", "es", "fr", "zh"]


@register("q_pivot", oracle=_PIVOT_ORACLE, tags=("agg",))
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows-to-columns with an EXPLICIT value list — without it
    Spark must first collect the distinct pivot values to the driver
    (an extra job, and nondeterministic column order); with it the
    pivot is a single pass, exactly the conditional aggregation the
    oracle writes out longhand.  Count of missing combinations is 0,
    not NULL (matching DuckDB's COUNT(CASE...))."""
    docs = load_table(spark, sf_dir, "documents")
    pv = (
        docs.groupBy("source")
        .pivot("lang", _LANGS)
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "source",
        *[
            F.coalesce(F.col(lang), F.lit(0)).alias(f"n_{lang}")
            for lang in _LANGS
        ],
    )


_UNPIVOT_ORACLE = """
SELECT p_partkey, attr, val FROM (
  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
  UNION ALL
  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
)
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE, tags=("agg",))
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: columns-to-rows via the native unpivot operator
    (one Expand node, no union-of-scans — the oracle's UNION ALL form
    reads the table twice, the Expand form once; at 100 TB that's the
    difference that matters)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    ).unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="attr",
        valueColumnName="val",
    )


_HISTOGRAM_ORACLE = """
SELECT
  CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11) AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
  CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders
GROUP BY bucket
"""


@register("q_histogram", oracle=_HISTOGRAM_ORACLE, tags=("agg",))
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-profile: fixed-width value histogram (12 x 50k buckets over
    order totals, top bucket open-ended) — the distribution profile a
    warehouse health check draws.  Bucketing is pure integer floor
    arithmetic (bit-identical across engines, unlike width_bucket
    variants with float edges); one partial+final hash aggregate on a
    12-value key, so the shuffle carries at most 12 rows per
    partition at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)), F.lit(11)
    ).cast("long")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
