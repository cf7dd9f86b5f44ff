"""Time-series operators beyond the windows.py family: exponential
decay smoothing, gap interpolation, and statistical anomaly flagging
(SURVEY.md §2.9 spirit — the keyed ProcessFunction patterns a metrics
pipeline runs, expressed as window/HOF plans, not Python loops).

Cross-engine exactness strategy (the repo-wide playbook):

- EWMA is float-hostile (an infinite product of alphas), so the
  operator is defined as its exact truncated form: a binary-decay
  weighted trailing average over the last 16 events, weight 2^-(lag+1)
  relative to the newest.  Numerator (micro-scaled to BIGINT — a
  decimal's pandas string repr differs between engines, an integer's
  cannot) and denominator are emitted SEPARATELY — no division ever
  happens, so both engines agree bit-for-bit.  Weights are powers of
  two built with shiftleft on integers, never pow() on doubles.
- Interpolation runs on micro-scaled integers (value -> DECIMAL(30,6)
  -> x1e6 -> BIGINT, exact by construction) and the interpolated value
  is the integer floor form (pv*(n-k) + nv*k) DIV n — integer division
  agrees across engines on non-negative operands.
- The z-score flag is algebraically cleared of division and sqrt:
  |x - mu| > 3*sigma  <=>  (n*x - s1)^2 > 9*(n*s2 - s1^2), all in
  exact wide-integer arithmetic (Spark DECIMAL(38,0), DuckDB HUGEINT).

Scale shape: every operator is one-to-two shuffles keyed by user_id
(window + regroup on the SAME key, so the exchange is reused), the
interpolation grid is bounded by span/step per key, and nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEC = "decimal(30,6)"

# trailing-window span for the binary-decay EWMA (newest event weight
# 2^15, oldest surviving weight 2^0; denominator 2^16 - 2^(16-m))
_EWMA_SPAN = 16

_EWMA_ORACLE = f"""
WITH v AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS STRING) AS DECIMAL(30,6)) AS dv,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
)
SELECT a.user_id, a.event_id,
  CAST(SUM(b.dv * (1::BIGINT << ({_EWMA_SPAN} - 1 - (a.rn - b.rn))))
       * 1000000 AS BIGINT) AS ewma_num_micro,
  CAST((1::BIGINT << {_EWMA_SPAN})
       - (1::BIGINT << ({_EWMA_SPAN} - COUNT(*))) AS BIGINT) AS ewma_den
FROM v a JOIN v b
  ON a.user_id = b.user_id
 AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
GROUP BY a.user_id, a.event_id
"""


@register("q_ewma", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponential smoothing (Flink: keyed ProcessFunction with
    a ValueState accumulator), as its exact truncated form: binary-
    decay weighted average over each user's trailing 16 events by
    (ts, event_id).  One window shuffle keyed by user_id; the weighted
    sum is a whole-stage-codegen higher-order fold over the frame's
    collect_list (deterministic frame order), weights are shiftleft
    powers of two, and num/den are emitted separately so no engine
    ever divides (module docstring).  The oracle replays the same
    frame as a banded rn self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    arr = F.collect_list(F.col("value").cast(_DEC)).over(w)
    return (
        ev.select("user_id", "event_id", arr.alias("arr"))
        .select(
            "user_id",
            "event_id",
            F.expr(
                f"""CAST(aggregate(
                  zip_with(arr, sequence(1, size(arr)),
                    (x, i) -> x * shiftleft(CAST(1 AS BIGINT),
                                            {_EWMA_SPAN} - size(arr) + i - 1)),
                  CAST(0 AS DECIMAL(38,6)),
                  (acc, x) -> acc + CAST(x AS DECIMAL(38,6))
                ) * 1000000 AS BIGINT)"""
            ).alias("ewma_num_micro"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {_EWMA_SPAN}) - "
                f"shiftleft(CAST(1 AS BIGINT), {_EWMA_SPAN} - size(arr))"
            ).alias("ewma_den"),
        )
    )


# 6-hour buckets over the fixture's 30-day span: ~120 grid points per
# user, sparse enough (~66 events/user) that interpolation does real
# work.  The grid is generated per key from its own [min, max] bucket
# span — bounded by span/step, never a global cross join.
_STEP_SEC = 6 * 3600

_INTERP_ORACLE = f"""
WITH obs AS (
  SELECT user_id,
         time_bucket(INTERVAL '{_STEP_SEC} seconds', CAST(ts AS TIMESTAMP))
           AS bstart,
         CAST(SUM(CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6))
                       * 1000000 AS BIGINT)) AS BIGINT) AS obs_micro
  FROM events
  GROUP BY 1, 2
), grid AS (
  SELECT user_id,
         unnest(generate_series(MIN(bstart), MAX(bstart),
                                INTERVAL '{_STEP_SEC} seconds')) AS bstart
  FROM obs
  GROUP BY user_id
), joined AS (
  SELECT g.user_id, g.bstart, o.obs_micro,
    last_value(o.obs_micro IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.bstart
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN o.obs_micro IS NOT NULL THEN g.bstart END
               IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.bstart
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(o.obs_micro IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.bstart
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN o.obs_micro IS NOT NULL THEN g.bstart END
                IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.bstart
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM grid g LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.bstart = o.bstart
)
SELECT user_id, bstart,
  CAST(CASE WHEN obs_micro IS NOT NULL THEN obs_micro
       ELSE (pv * ((CAST(epoch(nt) AS BIGINT) - CAST(epoch(bstart) AS BIGINT))
                   // {_STEP_SEC})
             + nv * ((CAST(epoch(bstart) AS BIGINT) - CAST(epoch(pt) AS BIGINT))
                     // {_STEP_SEC}))
            // ((CAST(epoch(nt) AS BIGINT) - CAST(epoch(pt) AS BIGINT))
                // {_STEP_SEC})
       END AS BIGINT) AS val_micro,
  CASE WHEN obs_micro IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
FROM joined
"""


@register("q_interpolate", oracle=_INTERP_ORACLE, tags=("timeseries",))
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION (q_gap_fill's step-function
    sibling): per user, 6-hour buckets from the key's first to last
    observation; missing buckets get the integer-exact interpolation
    (pv*(n-k) + nv*k) DIV n between their flanking observations
    (micro-scaled — module docstring).  Plan: bucket agg, per-key
    min/max, an in-row sequence() explode for the grid (bounded by
    span/step), one left join and two framed windows — all keyed by
    user_id, nothing driver-side."""
    ev = load_table(spark, sf_dir, "events")
    vi = (F.col("value").cast(_DEC) * 1000000).cast("long")
    obs = ev.groupBy(
        "user_id", F.window("ts", f"{_STEP_SEC} seconds")["start"].alias("bstart")
    ).agg(F.sum(vi).alias("obs_micro"))
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bstart").alias("mn"), F.max("bstart").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr(f"interval {_STEP_SEC} seconds"))
            ).alias("bstart"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("bstart")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("bstart")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    j = (
        grid.join(obs, ["user_id", "bstart"], "left")
        .withColumn("pv", F.last("obs_micro", ignorenulls=True).over(wp))
        .withColumn(
            "pt",
            F.last(
                F.when(F.col("obs_micro").isNotNull(), F.col("bstart")),
                ignorenulls=True,
            ).over(wp),
        )
        .withColumn("nv", F.first("obs_micro", ignorenulls=True).over(wn))
        .withColumn(
            "nt",
            F.first(
                F.when(F.col("obs_micro").isNotNull(), F.col("bstart")),
                ignorenulls=True,
            ).over(wn),
        )
    )
    interp = F.expr(
        f"(pv * ((unix_timestamp(nt) - unix_timestamp(bstart)) DIV {_STEP_SEC})"
        f" + nv * ((unix_timestamp(bstart) - unix_timestamp(pt)) DIV {_STEP_SEC}))"
        f" DIV ((unix_timestamp(nt) - unix_timestamp(pt)) DIV {_STEP_SEC})"
    )
    return j.select(
        "user_id",
        "bstart",
        F.when(F.col("obs_micro").isNotNull(), F.col("obs_micro"))
        .otherwise(interp)
        .cast("long")
        .alias("val_micro"),
        F.when(F.col("obs_micro").isNotNull(), F.lit("obs"))
        .otherwise(F.lit("interp"))
        .alias("src"),
    )


_ANOMALY_ORACLE = """
WITH v AS (
  SELECT user_id,
         CAST(CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
              AS BIGINT) AS HUGEINT) AS vi
  FROM events
), st AS (
  SELECT user_id, vi,
         COUNT(*) OVER w AS n,
         SUM(vi) OVER w AS s1,
         SUM(vi * vi) OVER w AS s2
  FROM v
  WINDOW w AS (PARTITION BY user_id)
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COALESCE(SUM(CASE WHEN (n * vi - s1) * (n * vi - s1)
                              > 9 * (n * s2 - s1 * s1)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_anomalies
FROM st
GROUP BY user_id
"""


@register("q_anomaly_zscore", oracle=_ANOMALY_ORACLE, tags=("timeseries",))
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier flagging per key — |x - mu| > 3*sigma
    against the key's own population, cleared of division/sqrt into
    exact wide-integer arithmetic (module docstring; Spark side
    DECIMAL(38,0), oracle side HUGEINT — only the BIGINT counts ever
    leave the engines).  Plan: one unbounded window keyed by user_id
    for (n, sum, sum-of-squares), then a regroup on the SAME key —
    the exchange is reused, so this is effectively a single shuffle.
    The fixture's value distribution is exponential-ish (sigma ~ mean),
    so ~1% of events trip the 3-sigma rule — the key asserts real
    work, not a vacuous zero column."""
    ev = load_table(spark, sf_dir, "events")
    vi = (
        (F.col("value").cast(_DEC) * 1000000)
        .cast("long")
        .cast("decimal(38,0)")
    )
    w = Window.partitionBy("user_id")
    st = ev.select(
        "user_id",
        vi.alias("vi"),
    ).select(
        "user_id",
        "vi",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("vi").over(w).alias("s1"),
        F.sum(F.col("vi") * F.col("vi")).over(w).alias("s2"),
    )
    dev = F.col("n") * F.col("vi") - F.col("s1")
    flag = (dev * dev) > F.lit(9) * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return st.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(
            F.sum(F.when(flag, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_anomalies"),
    )


# trailing window (in observed days) for the rolling correlation
_CORR_DAYS = 7

_ROLLING_CORR_ORACLE = f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS x,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS y
  FROM events
  GROUP BY 1, 2
), rolled AS (
  SELECT user_id, day,
    COUNT(*) OVER w AS n,
    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
    SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
    SUM(x * y) OVER w AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN {_CORR_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, day,
  CAST(n AS BIGINT) AS n_days,
  CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
  CAST(n * sxx - sx * sx AS BIGINT) AS corr_den_x,
  CAST(n * syy - sy * sy AS BIGINT) AS corr_den_y
FROM rolled
"""


@register("q_rolling_corr", oracle=_ROLLING_CORR_ORACLE, tags=("timeseries",))
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between two per-key daily series
    (view count vs purchase count) over a trailing 7-observed-day
    frame — the two-stream CoProcessFunction metric (does engagement
    track conversion?) as one daily agg plus one framed window, both
    keyed by user_id.  Cross-engine exactness: the correlation is
    emitted as its three integer components (corr_num, corr_den_x,
    corr_den_y with corr = num / sqrt(den_x * den_y)) — counts are
    integers, so n*Sxy - Sx*Sy etc. are exact BIGINTs in both engines
    and no sqrt or division ever runs engine-side."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-(_CORR_DAYS - 1), 0)
    )
    rolled = daily.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    return rolled.select(
        "user_id",
        "day",
        F.col("n").alias("n_days"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "corr_num"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "corr_den_x"
        ),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "corr_den_y"
        ),
    )


# ---- time-weighted average (round 9 continuation): the market-data
# TWAP/TWA metric — each observation weighted by how long it was the
# CURRENT value (until the next observation), the piecewise-constant
# integral every tick-data / sensor pipeline computes.  Exactness:
# value micro-ints times µs gaps overflow BIGINT (1e8 * 2.6e12), so
# the products accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
# and the numerator lands as units×µs (the sum DIV 10^6 — exact
# integer floor both engines, ~1e14 at fixture scale, BIGINT-safe
# to ~9e18 ≈ a century of µs at value 100).  num/den emitted
# separately — no division, repo playbook.
_TWAP_ORACLE = """
WITH v AS (
  SELECT user_id,
    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
    CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
         AS BIGINT) AS v_mic,
    LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS nt
  FROM events
)
SELECT user_id,
  CAST(SUM(CAST(v_mic AS HUGEINT) * (nt - t)) // 1000000 AS BIGINT)
    AS twap_num_unit_us,
  CAST(SUM(nt - t) AS BIGINT) AS twap_den_us
FROM v WHERE nt IS NOT NULL
GROUP BY user_id
"""


@register("q_twap", oracle=_TWAP_ORACLE, tags=("timeseries",))
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (block comment above): each
    event's value weighted by its holding interval (lead(ts) - ts);
    the final observation holds nothing and drops out, matching the
    closed-interval convention.  One window + one aggregate on the
    SAME user_id key — the exchange is reused; ties at equal ts get
    the deterministic (ts, event_id) order and contribute a zero-width
    interval either way."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000 "
            "AS BIGINT)"
        ).alias("v_mic"),
    )
    v = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "v_mic",
        F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("nt"),
    ).where(F.col("nt").isNotNull())
    return v.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CAST(v_mic AS DECIMAL(38,0)) * (nt - t)) "
            "div 1000000 AS BIGINT)"
        ).alias("twap_num_unit_us"),
        F.sum(F.col("nt") - F.col("t")).cast("long").alias("twap_den_us"),
    )


# CUSUM drift constants (micro-scaled value units): reference level K
# (the in-control mean the page test charges against) and decision
# threshold H, tuned so the fixture alarms on a realistic minority of
# keys (~1/6 of users at sf0.01) and the no-alarm sentinel path stays
# exercised.
CUSUM_K = 60_000_000
CUSUM_H = 400_000_000

_CUSUM_ORACLE = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
    CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
         AS BIGINT) - {CUSUM_K} AS d
  FROM events
), p AS (
  SELECT user_id,
    ROW_NUMBER() OVER w AS rn,
    SUM(CAST(d AS HUGEINT)) OVER w AS pp
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
), s AS (
  SELECT user_id, rn,
    pp - LEAST(0, MIN(pp) OVER (PARTITION BY user_id ORDER BY rn
                                ROWS UNBOUNDED PRECEDING)) AS s
  FROM p
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN s > {CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_alarms,
  CAST(COALESCE(MIN(CASE WHEN s > {CUSUM_H} THEN rn END), -1) AS BIGINT)
    AS first_alarm_rn,
  CAST(MAX(s) AS BIGINT) AS max_s
FROM s GROUP BY user_id
"""


@register("q_cusum", oracle=_CUSUM_ORACLE, tags=("timeseries",))
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection (the Page test) per key — the
    drift monitor a metrics pipeline runs beside its z-score flags.
    The textbook recursion S_t = max(0, S_{t-1} + x_t - K) is not a
    window expression, but its closed form is: with P_t the prefix
    sum of (x_t - K), S_t = P_t - min(0, min_{j<=t} P_j) — prefix
    sum plus running min, both plain frames over ONE per-key window
    order (ts, event_id), so the whole operator is a single user_id
    shuffle reused by every window (plus the final regroup on the
    SAME key).  Alarms fire while S_t exceeds H; per key the operator
    emits event count, alarm count, first alarm position (-1 when in
    control — no NULLs, engines' NULL reprs differ in pandas) and the
    peak statistic.  Exactness: micro-scaled integer deviations,
    prefix sums in DECIMAL(38,0)/HUGEINT for corpus-scale headroom,
    outputs BIGINT.  The streaming twin (streaming/queries.py
    cusum_stream) carries (P, minP) as two-BIGINT keyed state and
    shares this oracle verbatim."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            (F.col("value").cast("decimal(30,6)") * 1_000_000).cast("long")
            - F.lit(CUSUM_K)
        ).alias("d"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    p = v.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("d").cast("decimal(38,0)")).over(frame).alias("pp"),
    )
    s = p.select(
        "user_id",
        "rn",
        (
            F.col("pp")
            - F.least(
                F.lit(0).cast("decimal(38,0)"),
                F.min("pp").over(
                    Window.partitionBy("user_id")
                    .orderBy("rn")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        ).alias("s"),
    )
    alarm = F.col("s") > F.lit(CUSUM_H)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(alarm.cast("long")).alias("n_alarms"),
        F.coalesce(
            F.min(F.when(alarm, F.col("rn"))), F.lit(-1)
        ).cast("long").alias("first_alarm_rn"),
        F.max("s").cast("long").alias("max_s"),
    )


_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT event_type,
    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
), pairs AS (
  SELECT event_type, x,
    LEAD(x) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM daily
), s AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx,
    CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs WHERE y IS NOT NULL GROUP BY event_type
)
SELECT event_type, n,
  CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
  CAST(n * sxx - sx * sx AS BIGINT) AS corr_den_x,
  CAST(n * syy - sy * sy AS BIGINT) AS corr_den_y
FROM s
"""


@register("q_autocorr", oracle=_AUTOCORR_ORACLE, tags=("timeseries",))
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's DAILY VOLUME — the
    seasonality probe run before any forecasting job (is today's
    traffic predicted by yesterday's?).  Consecutive-day pairs come
    from one LEAD over the per-type daily rollup (gaps intentionally
    pair across them: the series is observation-ordered, the
    q_interpolate key owns grid filling); the Pearson components are
    emitted exactly as integers — corr = num / sqrt(den_x * den_y)
    for the consumer — because daily counts are small integers, every
    polynomial fits BIGINT with orders of magnitude to spare.  Scale:
    the rollup is one hash aggregate on (type, day); the window runs
    over type-count x day-count rows — horizon-sized, not
    event-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type", "x", F.lead("x").over(w).alias("y")
    ).where(F.col("y").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("corr_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("corr_den_x"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("long")
        .alias("corr_den_y"),
    )


_SEASONALITY_ORACLE = """
WITH wd AS (
  SELECT event_type,
    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7
         AS BIGINT) AS weekday
  FROM events
), counts AS (
  SELECT event_type, weekday, CAST(COUNT(*) AS BIGINT) AS n
  FROM wd GROUP BY event_type, weekday
), tot AS (
  SELECT event_type, SUM(n) AS t FROM counts GROUP BY event_type
)
SELECT c.event_type, c.weekday, c.n,
  CAST(1000 * c.n // t.t AS BIGINT) AS share_pm
FROM counts c JOIN tot t ON c.event_type = t.event_type
"""


@register("q_seasonality", oracle=_SEASONALITY_ORACLE, tags=("timeseries",))
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal profile — per event type, each weekday's share
    of activity in floored per-mille (the seasonality fingerprint a
    forecast residual or an anomaly baseline divides out).  The
    weekday is pure integer arithmetic on epoch days ((days + 4) % 7,
    Sunday = 0 — 1970-01-01 was a Thursday), sidestepping the
    dayofweek() dialect split (Spark is 1-based, DuckDB 0-based);
    shares are integer-div per-mille against per-type totals
    (q_benford's pattern, here keyed).  Scale: one hash aggregation
    to <= 7 x |event types| rows, then arithmetic on that constant-
    size frame — the per-type totals join is broadcast."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 + 4) % 7"
            ).alias("weekday"),
        )
        .groupBy("event_type", "weekday")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("t"))
    return counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "weekday",
        "n",
        F.expr("CAST(1000 * n div t AS BIGINT)").alias("share_pm"),
    )
