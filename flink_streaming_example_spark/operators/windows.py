"""Windows (SURVEY.md §2.4): event-time windows W1-W4 on batch
semantics, and batch OVER-window functions W8-W11.

Event-time windows are THE heart of the Flink reference ([F
`TumblingEventTimeWindows` / `SlidingEventTimeWindows` /
`EventTimeSessionWindows` / `KeyedStream#countWindow`]).  Spark's
`window()` / `session_window()` grouping expressions run identically on
batch and streaming DataFrames (SURVEY §1.3) — the batch run here is
the oracle-checkable path; streaming/queries.py re-runs the same
expressions on readStream.

Timestamp discipline: events.ts is ns in parquet, truncated to µs at
the source (sources/tables.py); every oracle casts `ts` to DuckDB
TIMESTAMP (µs) so both engines window the same instants.

Boundary semantics pinned down for the oracles:
- tumbling/sliding starts are epoch-aligned (and DuckDB time_bucket's
  2000-01-03 origin is midnight-aligned, so 12h/1d buckets agree);
- a session is EXTENDED by an event at exactly last+gap (merge when
  diff <= gap; new session only when diff > gap — pinned by the
  exact-boundary synthetic test in tests/test_session_semantics.py),
  hence strict `> INTERVAL` in the gaps-and-islands oracle.

Scale notes (100 TB): window aggregates shuffle on (window, key) — the
window id is derived, so cardinality = keys x active windows, not input
rows; partial aggregation runs map-side.  The count window (W4) needs a
per-key row_number (one shuffle + per-key sort) — no SS equivalent
exists (count triggers), streaming would use transformWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.functions.stable import (
    sql_stable_sum,
    stable_sum,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEC = "decimal(30,6)"

_TUMBLING_ORACLE = f"""
SELECT
  date_trunc('day', CAST(ts AS TIMESTAMP)) AS wstart,
  event_type,
  COUNT(*) AS n_events,
  {sql_stable_sum("value", "sum_value")}
FROM events
GROUP BY 1, 2
"""


@register("q_tumbling_window", oracle=_TUMBLING_ORACLE, tags=("window",))
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: tumbling event-time window (1 day) per event_type — Flink's
    `keyBy(type).window(TumblingEventTimeWindows.of(days(1))).sum(v)`.
    Epoch-aligned `window()` start == date_trunc('day') in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SLIDING_ORACLE = f"""
SELECT wstart, COUNT(*) AS n_events, {sql_stable_sum("value", "sum_value")}
FROM (
  SELECT
    unnest([
      time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)),
      time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) - INTERVAL '12 hours'
    ]) AS wstart,
    value
  FROM events
)
GROUP BY wstart
"""


@register("q_sliding_window", oracle=_SLIDING_ORACLE, tags=("window",))
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: sliding window (size 1 day, slide 12h) — each event lands in
    exactly size/slide = 2 windows; the oracle replays that expansion
    with an explicit unnest of the two candidate window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum("value", "sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n_events", "sum_value")
    )


_SESSION_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
), flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             > INTERVAL '6 hours'
         THEN 1 ELSE 0 END AS new_session
  FROM e
), numbered AS (
  SELECT *,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM flagged
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL '6 hours' AS session_end,
  COUNT(*) AS n_events,
  {sql_stable_sum("value", "sum_value")}
FROM numbered
GROUP BY user_id, session_id
"""


@register("q_session_window", oracle=_SESSION_ORACLE, tags=("window",))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: session window (6h inactivity gap) per user — Flink's
    `EventTimeSessionWindows.withGap`.  The oracle is the classic
    gaps-and-islands rewrite; session_end = last event + gap matches
    Spark's [start, last+gap) window struct."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_COUNT_WINDOW_ORACLE = f"""
WITH numbered AS (
  SELECT user_id, value,
    ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
    ) AS rn
  FROM events
)
SELECT
  user_id,
  CAST(FLOOR((rn - 1) / 5) AS BIGINT) AS win_id,
  COUNT(*) AS n_events,
  {sql_stable_sum("value", "sum_value")}
FROM numbered
GROUP BY user_id, win_id
"""


@register("q_count_window", oracle=_COUNT_WINDOW_ORACLE, tags=("window",))
def q_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: count window (every 5 records per key, batch semantics) —
    Flink's `countWindow(5)`; window id = floor(rank/5) over the
    deterministic (ts, event_id) order.  No SS equivalent (count
    triggers); the streaming path would be transformWithState."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return (
        ev.withColumn("win_id", F.floor((rn - 1) / 5))
        .groupBy("user_id", "win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum("value", "sum_value"),
        )
    )


_LATE_SPLIT_ORACLE = """
SELECT
  event_id,
  CAST(ts AS TIMESTAMP) <
    (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL '1 day'
    AS is_late
FROM events
"""


@register("q_late_split", oracle=_LATE_SPLIT_ORACLE, tags=("window",))
def q_late_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: late-data side output, batch semantics — classify each event
    against the final watermark (max event time - 1 day delay), the
    same predicate Structured Streaming applies when dropping late rows
    (Flink would re-fire via allowedLateness + side output; Spark drops
    — semantics delta documented in SURVEY §2.4 W5/W6).  The watermark
    scalar is a broadcast one-row aggregate, not a window-over-all."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("wm")
    )
    return ev.crossJoin(F.broadcast(wm)).select(
        "event_id", (F.col("ts") < F.col("wm")).alias("is_late")
    )


_RANK_ORACLE = """
SELECT
  p_partkey, p_brand, p_retailprice,
  CAST(ROW_NUMBER() OVER w_total AS INTEGER) AS rn,
  CAST(RANK() OVER w_price AS INTEGER) AS rnk,
  CAST(DENSE_RANK() OVER w_price AS INTEGER) AS drnk,
  CAST(NTILE(4) OVER w_total AS INTEGER) AS quartile,
  PERCENT_RANK() OVER w_price AS prank,
  CUME_DIST() OVER w_price AS cdist
FROM part
WINDOW
  w_total AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey),
  w_price AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
"""


@register("q_rank", oracle=_RANK_ORACLE, tags=("window",))
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: ranking functions per group.  row_number/ntile use a total
    order (price, partkey tiebreaker); rank/dense_rank use the
    price-only order so ties actually exercise their semantics."""
    part = load_table(spark, sf_dir, "part")
    w_total = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    w_price = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_price).alias("rnk"),
        F.dense_rank().over(w_price).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
        # exact small-integer ratios — identical doubles in both engines
        F.percent_rank().over(w_price).alias("prank"),
        F.cume_dist().over(w_price).alias("cdist"),
    )


_LAG_LEAD_ORACLE = """
SELECT
  event_id, user_id,
  lag(value)  OVER w AS prev_value,
  lead(value) OVER w AS next_value,
  first_value(event_id) OVER w AS first_event_id,
  last_value(event_id) OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS last_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


@register("q_lag_lead", oracle=_LAG_LEAD_ORACLE, tags=("window",))
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: analytic functions — lag/lead/first/last per user in event
    order.  last_value needs the unbounded-following frame (the default
    frame stops at CURRENT ROW in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event_id"),
        F.last("event_id").over(w_full).alias("last_event_id"),
    )


_MOVING_ORACLE = f"""
SELECT
  event_id, user_id,
  CAST(SUM(CAST(value AS {_DEC})) OVER w AS DOUBLE) AS mov_sum,
  CAST(SUM(CAST(value AS {_DEC})) OVER w AS DOUBLE) / COUNT(value) OVER w
    AS mov_avg
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
)
"""


@register("q_moving_avg", oracle=_MOVING_ORACLE, tags=("window",))
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: framed aggregates — 4-row moving sum/avg per user.  The
    frame sum runs in exact decimal (engines may accumulate frames in
    different orders; decimal is order-free), then one deterministic
    IEEE division for the mean."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    sum_dec = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    return ev.select(
        "event_id",
        "user_id",
        sum_dec.alias("mov_sum"),
        (sum_dec / F.count("value").over(w)).alias("mov_avg"),
    )


_TOPK_GROUP_ORACLE = """
SELECT event_type, event_id, value, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT event_type, event_id, value,
    ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id
    ) AS rn
  FROM events
)
WHERE rn <= 3
"""


@register("q_topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("window",))
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: top-k per group — row_number <= k over (value desc,
    event_id) with the tiebreaker making the cut deterministic.  Spark
    plans a per-key sort after one shuffle; AQE handles skewed keys."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.select(
            "event_type", "event_id", "value", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         COUNT(*) AS n
  FROM events GROUP BY user_id, day
), bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM bounds
)
SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n_events,
  last_value(d.n IGNORE NULLS)
    OVER (PARTITION BY s.user_id ORDER BY s.day) AS n_filled
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@register("q_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("window", "timeseries"))
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per-user daily activity counts
    densified onto a complete day spine (sequence + explode — each
    user's spine generates from its own min/max, no driver loop), with
    missing days as zeros AND as last-observation-carried-forward
    (conditional last-value window).  The spine explode is the
    time-series twin of flatMap; forward fill is the W9 analytic
    surface doing real work.  At 100 TB the spine is generated, not
    stored — rows materialize only at the final join, partitioned by
    the same user_id key as the aggregate feeding it."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("n", ignorenulls=True).over(w).alias("n_filled"),
    )


_TIME_ROLLUP_ORACLE = f"""
SELECT event_type, granularity, bucket_start,
  COUNT(*) AS n_events, {sql_stable_sum("value", "sum_value")}
FROM (
  SELECT event_type, 'hour' AS granularity,
    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_start, value
  FROM events
  UNION ALL
  SELECT event_type, 'day' AS granularity,
    date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_start, value
  FROM events
)
GROUP BY event_type, granularity, bucket_start
"""


@register("q_time_rollup", oracle=_TIME_ROLLUP_ORACLE, tags=("window",))
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly AND daily
    continuous-aggregate tiers of the event stream from ONE fact scan
    — GROUPING SETS over the two date_trunc derivations (a single
    Expand + hash aggregate; the oracle's UNION ALL formulation would
    scan the fact table once per tier, which is exactly what this
    plan avoids at 100 TB).  The coarser tier costs no extra scan
    because Expand duplicates rows map-side, pre-shuffle partial
    aggregation collapses them, and the shuffle carries only
    (type x bucket) group cells."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_rollup"
    )
    return spark.sql(
        f"""
        SELECT event_type,
          CASE WHEN h IS NOT NULL THEN 'hour' ELSE 'day' END AS granularity,
          COALESCE(h, d) AS bucket_start,
          COUNT(*) AS n_events,
          {sql_stable_sum("value", "sum_value")}
        FROM (
          SELECT event_type, value,
            date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d
          FROM events_rollup
        )
        GROUP BY event_type, GROUPING SETS ((event_type, h), (event_type, d))
        """
    )


# Dynamic-gap sessions are INTERVAL-UNION semantics, not chain
# semantics: each event spans [ts, ts+gap(event)) and transitively
# overlapping spans merge, so a long-gap event can bridge a pair of
# short-gap events that would not chain on their own.  The oracle
# mirrors this with the running-max-end island test (new session iff
# ts > max over prior events of end_ts; `>=` extends, matching the
# strict-gap boundary convention pinned for the fixed-gap session
# window in tests/test_session_semantics.py and the property fuzz).
_SESSION_DYN_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
    CAST(ts AS TIMESTAMP) + CASE WHEN event_type = 'purchase'
        THEN INTERVAL 2 HOUR ELSE INTERVAL 1 HOUR END AS end_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN MAX(end_ts) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= ts
    THEN 0 ELSE 1 END AS new_s
  FROM e
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT MIN(ts) AS s_start, MAX(end_ts) AS s_end, user_id,
       COUNT(*) AS n
FROM numbered GROUP BY user_id, sid
"""


@register("q_session_dynamic_gap", oracle=_SESSION_DYN_ORACLE, tags=("window",))
def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3-depth: dynamic-gap session windows (Flink
    SessionWindows.withDynamicGap) — the inactivity gap is a
    per-event EXPRESSION (purchases hold a session open 2h, other
    events 1h), via Spark's session_window with a calendar-interval
    gap column.  Interval-union merge semantics and the >= boundary
    convention are mirrored exactly by the running-max-end oracle
    (comment above).  Same single shuffle by user as the fixed-gap
    session window; the gap expression is row-local."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.expr(
        "make_interval(0, 0, 0, 0, "
        "CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END, 0, 0)"
    )
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), gap), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "n",
        )
    )


# OHLC ordering: arg_min/min_by need ONE sortable key, and neither
# engine orders structs in that position (DuckDB arg_min has no
# struct overload), so open/close use an integer composite —
# microsecond-of-day * 10^8 + event_id.  µs-of-day < 8.64e10, so the
# composite tops out ~8.64e18, just under 2^63; the event_id term
# makes the selection deterministic even under equal timestamps.
# The multiplier bounds valid ids at 10^8: an id >= the multiplier
# would bleed into the time term and SILENTLY mis-order (both
# engines identically, so the hash check cannot catch it — review
# finding, round 7).  Sparse/wider id spaces must re-rank ids first
# (dense row_number) or rank with a window instead.
#
# OHLC_ORDER_MULT and ohlc_order_key() are THE single source of this
# composite: q_ohlc, q_streaming_ohlc, the oracle SQL (f-string below)
# and tests/test_ohlc_ties.py all build the key through here, so the
# multiplier cannot drift between the twins (round-7 advisor found
# the streaming copy had silently diverged to 10^6).
OHLC_ORDER_MULT = 100_000_000


def ohlc_order_key(ts_col, day_col):
    """Integer composite order key for open/close selection:
    microsecond-of-day * OHLC_ORDER_MULT + event_id.  `ts_col` must
    already be TimestampType; `day_col` the day-truncated timestamp."""
    return (
        F.unix_micros(ts_col) - F.unix_micros(day_col)
    ) * F.lit(OHLC_ORDER_MULT) + F.col("event_id")


_OHLC_ORACLE = f"""
SELECT
  date_trunc('day', CAST(ts AS TIMESTAMP)) AS wday,
  user_id,
  arg_min(value, (epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))))
                 * {OHLC_ORDER_MULT} + event_id) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  arg_max(value, (epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))))
                 * {OHLC_ORDER_MULT} + event_id) AS close,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


@register("q_ohlc", oracle=_OHLC_ORACLE, tags=("window", "timeseries"))
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-depth: OHLC downsampling — per (user, day) bar with open /
    high / low / close / count, the classic time-series rollup (and
    the general first/last-in-window selection primitive behind
    hypertable-style continuous aggregates).  One shuffle keyed by
    (day, user); open/close are min_by/max_by on the deterministic
    integer composite above — pure value SELECTION, no float
    arithmetic, so the bars are bit-exact cross-engine.  At 100 TB
    this is the downsample-on-ingest shape: partial min/max/first/last
    combine map-side, and coarser bars (hour -> day -> month) stack by
    re-aggregating bars, not raw rows."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    order_key = ohlc_order_key(F.col("ts").cast("timestamp"), day)
    return (
        ev.select(
            day.alias("wday"),
            "user_id",
            "event_id",
            "value",
            order_key.alias("ok"),
        )
        .groupBy("wday", "user_id")
        .agg(
            F.min_by("value", "ok").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ok").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_DELTA_ORACLE = """
SELECT
  event_id,
  user_id,
  value,
  value - lag(value) OVER w AS delta,
  CAST(date_diff('microseconds',
                 lag(CAST(ts AS TIMESTAMP)) OVER w,
                 CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


@register("q_delta_encode", oracle=_DELTA_ORACLE, tags=("window",))
def q_delta_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-depth: per-key delta encoding — value diffs and inter-event
    microsecond gaps in event order (the derivative view behind
    rate-of-change alerting and the first step of delta compression;
    both doubles come from single IEEE subtractions of identical
    inputs, so no rounding shim is needed).  One shuffle keyed by
    user_id, then a linear running-frame scan per key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).cast("long").alias("gap_us"),
    )


_NTILE_ORACLE = """
WITH t AS (
  SELECT o_orderpriority,
         o_totalprice,
         ntile(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT o_orderpriority, decile,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  MIN(o_totalprice) AS lo,
  MAX(o_totalprice) AS hi
FROM t
GROUP BY o_orderpriority, decile
"""


@register("q_ntile", oracle=_NTILE_ORACLE, tags=("window",))
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8-adjacent: NTILE decile bucketing per group — the equal-
    frequency binning behind percentile reports and feature
    discretization.  Both engines implement ANSI NTILE (first n mod k
    tiles get the extra row), and the order key is made total with the
    unique o_orderkey tiebreak, so tile assignment is deterministic
    cross-engine.  min/max per tile pass doubles through untouched
    (no summation — exact).  One window shuffle + a regroup on the
    same key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(10).over(w).alias("decile"),
        )
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


_PCTRANK_ORACLE = """
WITH v AS (
  SELECT c_custkey, c_mktsegment AS segment,
    CAST(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(30,6)) * 1000000
         AS BIGINT) AS bal_micros
  FROM customer
)
SELECT c_custkey, segment,
  CAST(RANK() OVER (PARTITION BY segment ORDER BY bal_micros)
       AS BIGINT) AS rnk,
  CAST(COUNT(*) OVER (PARTITION BY segment ORDER BY bal_micros
       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cume_n,
  CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n_seg
FROM v
"""


@register("q_percent_rank", oracle=_PCTRANK_ORACLE, tags=("window",))
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8-depth: percent_rank / cume_dist as exact integer parts —
    rank, peers-inclusive cumulative count (the cume_dist numerator,
    via a RANGE frame so ties count together), and the partition size
    — so percent_rank = (rnk-1)/(n_seg-1) and cume_dist = cume_n/n_seg
    are ratios the CALLER divides; the engine never emits a float.
    Quantile-normalization / empirical-CDF feature prep in one window
    exchange (all three functions share the segment partitioning)."""
    customer = load_table(spark, sf_dir, "customer")
    v = customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(30,6)) "
            "* 1000000 AS BIGINT)"
        ).alias("bal_micros"),
    )
    wo = Window.partitionBy("segment").orderBy("bal_micros")
    wrange = wo.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("segment")
    return v.select(
        "c_custkey",
        "segment",
        F.rank().over(wo).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wrange).cast("long").alias("cume_n"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_seg"),
    )


_OFFSET_H = 8
_DAY_US_W = 86_400_000_000

_WINDOW_OFFSET_ORACLE = f"""
SELECT
  CAST((epoch_us(CAST(ts AS TIMESTAMP)) - {_OFFSET_H} * 3600000000)
       // {_DAY_US_W} AS BIGINT) AS wday,
  event_type,
  COUNT(*) AS n_events,
  {sql_stable_sum("value", "sum_value")}
FROM events
GROUP BY 1, 2
"""


@register(
    "q_window_offset", oracle=_WINDOW_OFFSET_ORACLE, tags=("window",)
)
def q_window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-offset: Flink's TumblingEventTimeWindows.of(size, OFFSET) —
    daily windows whose boundary sits at 08:00 instead of midnight
    (business-day cutoffs, or day windows in a non-UTC market's local
    time — the canonical use of the offset parameter).  Spark's
    window() takes the same thing as startTime; the emitted key is
    the offset-day INDEX ((epoch_us - 8h) div day, identical closed
    form in the oracle), so window identity — not just membership
    counts — is what hashes.  Same single partial+final aggregate
    shape as the epoch-aligned W1."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day", startTime=f"{_OFFSET_H} hours").alias(
                "w"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum("value", "sum_value"),
        )
        .select(
            F.expr(
                f"(unix_micros(CAST(w.start AS TIMESTAMP))"
                f" - {_OFFSET_H} * 3600000000) div {_DAY_US_W}"
            ).alias("wday"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_RANGE_FRAME_ORACLE = """
WITH daily AS (
  SELECT user_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
           AS day,
         CAST(SUM(CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(30,6))
                       * 1000000 AS BIGINT)) AS BIGINT) AS day_vi
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, day_vi,
  CAST(SUM(day_vi) OVER (
    PARTITION BY user_id ORDER BY day
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS trail7_vi
FROM daily
"""


@register("q_range_frame_7d", oracle=_RANGE_FRAME_ORACLE, tags=("window",))
def q_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10-range: a time-RANGE framed aggregate — the frame boundary is
    a VALUE interval (trailing 7 calendar days per user), not a row
    count, so days with no events correctly shrink the window (a ROWS
    frame cannot express this; Flink's OVER RANGE INTERVAL '7' DAY
    class).  Amounts ride as exact micro-ints (DECIMAL ingest, the
    repo's standard float policy) so the frame sum is order-free and
    engine-exact.  Plan: one shuffle for the per-(user, day) rollup,
    then the range frame runs inside the SAME user partitioning — no
    second exchange; at 100 TB the state per frame is bounded by 7
    distinct days regardless of event volume because the rollup
    happens first."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            F.expr(
                "CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT)"
            ).alias("vi"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("vi").alias("day_vi"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        "day_vi",
        F.sum("day_vi").over(w).alias("trail7_vi"),
    )
