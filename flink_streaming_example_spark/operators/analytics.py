"""Behavioral / product-analytics operators over the events stream
table: retention cohorts, ordered funnel conversion, and cumulative
distinct users — the session-and-lifecycle reporting family every
event-analytics engine ships (SURVEY.md §2.4/§2.9 spirit).

Cross-engine exactness: all time bucketing is integer epoch
arithmetic — week = epoch_us DIV 604_800_000_000, day = epoch_us DIV
86_400_000_000 — identical floor division on both engines (events are
post-1970 so operands are non-negative).  Counts are exact BIGINTs;
no floats anywhere.

Scale shape:
- Retention and running-distinct both hinge on a per-user MIN —
  one hash aggregate keyed by user_id whose exchange is REUSED by the
  join back to the activity set (same key), then a small per-bucket
  aggregate.  Nothing is ever keyed by (user × week) before the
  per-user reduction.
- The funnel is a chain of per-user conditional MINs: each step is a
  groupBy(user) + equi-join on user_id — the same partitioning all
  the way down, so at scale the whole chain is ONE exchange of the
  event log plus user-sized intermediates.
- The only global-order window (running distinct's cumulative sum)
  runs AFTER aggregation to per-day rows — driver-scale cardinality
  (#days), not data-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_WEEK_US = 7 * 86_400 * 1_000_000
_DAY_US = 86_400 * 1_000_000

_RETENTION_ORACLE = f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
), c AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id
)
SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
FROM w JOIN c ON w.user_id = c.user_id
GROUP BY c.cohort_wk, week_offset
"""


@register("q_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("analytics",))
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-seen week,
    counted per (cohort, weeks-since-cohort) cell — the classic
    retention triangle.  Per-user MIN then join-back share one
    user_id exchange (module docstring); the cell aggregate output is
    #weeks² rows — tiny at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = events.select(
        "user_id",
        F.expr(
            f"unix_micros(CAST(ts AS TIMESTAMP)) div {_WEEK_US}"
        ).alias("wk"),
    )
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        w.join(c, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


# Funnel step chain: each step's timestamp must STRICTLY follow the
# previous step's for the same user (ordered conversion, not mere
# co-occurrence).  signup -> view -> click -> purchase matches the
# fixture's event_type vocabulary.
_FUNNEL_STEPS = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
), s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_order, 'signup' AS step,
         CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'view', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'click', COUNT(*) FROM s3
  UNION ALL
  SELECT 4, 'purchase', COUNT(*) FROM s4
)
"""


def funnel_steps(events: DataFrame) -> DataFrame:
    """The funnel core on an arbitrary (user_id, event_type, ts) frame
    — factored out so the cross-engine property fuzz
    (tests/test_property.py) can drive it with adversarial tie-heavy
    timelines; q_funnel_steps feeds it the fixture."""
    prev: DataFrame | None = None
    stages: list[DataFrame] = []
    for step in _FUNNEL_STEPS:
        e = events.where(F.col("event_type") == step)
        if prev is None:
            cur = e.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                e.join(prev.select("user_id", F.col("t").alias("pt")), "user_id")
                .where(F.col("ts") > F.col("pt"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        stages.append(cur)
        prev = cur
    counts = [
        s.agg(
            F.lit(i + 1).cast("long").alias("step_order"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, (step, s) in enumerate(zip(_FUNNEL_STEPS, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


@register("q_funnel_steps", oracle=_FUNNEL_ORACLE, tags=("analytics",))
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: per step, the number of users whose
    earliest qualifying event STRICTLY follows their previous step's
    timestamp (signup -> view -> click -> purchase).  Set-based
    companion to q_cep_funnel's pattern automaton: each stage is a
    per-user conditional MIN + equi-join on user_id — one partitioning
    reused down the whole chain (module docstring)."""
    return funnel_steps(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts"
        )
    )


_RUNNING_DISTINCT_ORACLE = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id
), new_per_day AS (
  SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY first_day
), active AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
  FROM d GROUP BY day
)
SELECT a.day, a.n_active,
  CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY a.day) AS BIGINT)
    AS cum_distinct
FROM active a LEFT JOIN new_per_day n ON a.day = n.day
"""


@register("q_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE, tags=("analytics",))
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + cumulative distinct users ever seen.
    Running COUNT(DISTINCT) is not windowable directly; the scalable
    identity is cum_distinct(day) = Σ first-appearances ≤ day — a
    per-user MIN, a per-day count, and a cumulative sum over the
    per-day table (driver-scale rows; module docstring on why the
    single-partition window is safe HERE and only here)."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "user_id",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}").alias("day"),
    )
    firsts = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    active = d.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("n_active")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new_per_day, "day", "left")
        .select(
            "day",
            "n_active",
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).alias("cum_distinct"),
        )
    )
