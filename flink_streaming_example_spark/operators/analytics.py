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
- The funnel is ONE groupBy(user) pass — first-step MIN plus each
  later step's sorted per-user timestamp list, the strictly-after
  chain resolved by array higher-order expressions in place — a
  single exchange of the event log, no joins (funnel_steps).
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
    timelines; q_funnel_steps feeds it the fixture.

    ONE events pass (plan-gated): the old stage-join chain referenced
    stage k-1's subtree from stage k, re-deriving the source
    1+2+3+4 = 10 times at the scan (caught when round 11 de-vacuumed
    test_fact_scanned_once).  Instead, one groupBy collects the first
    step's MIN plus each later step's per-user SORTED timestamp list
    (per-user-cardinality-bounded, the session-operator state bound),
    and the strictly-after chain resolves per row with
    filter(l, x -> x > t_prev)[1] — JVM higher-order expressions, no
    joins, no re-scan.  The final 4-row emission stacks off the one
    scalar count row."""
    aggs = [
        F.min(
            F.when(F.col("event_type") == _FUNNEL_STEPS[0], F.col("ts"))
        ).alias("t1")
    ]
    for i, step in enumerate(_FUNNEL_STEPS[1:], start=2):
        aggs.append(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == step, F.col("ts"))
                )
            ).alias(f"l{i}")
        )
    u = events.groupBy("user_id").agg(*aggs)
    for i in range(2, len(_FUNNEL_STEPS) + 1):
        prev = F.col(f"t{i - 1}")
        u = u.withColumn(
            f"t{i}",
            # try_element_at: NULL (not an ANSI error) when no element
            # of the step's list is strictly after the previous step
            F.try_element_at(
                F.filter(F.col(f"l{i}"), lambda x: x > prev), F.lit(1)
            ),
        )
    counts = u.agg(
        *[
            F.sum(
                F.when(F.col(f"t{i + 1}").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"n{i + 1}")
            for i in range(len(_FUNNEL_STEPS))
        ]
    )
    return counts.selectExpr(
        "stack("
        + str(len(_FUNNEL_STEPS))
        + ", "
        + ", ".join(
            f"CAST({i + 1} AS BIGINT), '{step}', n{i + 1}"
            for i, step in enumerate(_FUNNEL_STEPS)
        )
        + ") AS (step_order, step, n_users)"
    )


@register("q_funnel_steps", oracle=_FUNNEL_ORACLE, tags=("analytics",))
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: per step, the number of users whose
    earliest qualifying event STRICTLY follows their previous step's
    timestamp (signup -> view -> click -> purchase).  Set-based
    companion to q_cep_funnel's pattern automaton: one per-user
    aggregation pass, the step chain resolved in place over sorted
    per-step timestamp lists (funnel_steps docstring)."""
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


_TRANSITIONS_ORACLE = """
WITH o AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
  CAST(COUNT(*) AS BIGINT) AS n_trans,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("q_path_transitions", oracle=_TRANSITIONS_ORACLE, tags=("analytics",))
def q_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    timeline: for consecutive events of a user (ordered by ts with
    event_id as the unique tiebreak), count every prev_type→next_type
    edge and the distinct users traversing it.  One shuffle keyed by
    user_id for the lag window, then a vocabulary²-sized aggregate —
    the transition matrix behind "users who did X next did Y"."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        o.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # same 30-min inactivity gap as W3
_PATH_CAP = 8

_SESSION_PATHS_ORACLE = f"""
WITH b AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
), l AS (
  SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
    AS prev_tus FROM b
), s AS (
  SELECT *, SUM(CASE WHEN prev_tus IS NULL
                      OR tus - prev_tus > {_SESSION_GAP_US}
                 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY tus, event_id
          ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
), p AS (
  SELECT user_id, sess,
    array_to_string(
      (list(event_type ORDER BY tus, event_id))[1:{_PATH_CAP}], '>') AS path
  FROM s GROUP BY user_id, sess
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM p GROUP BY path
"""


def session_paths(d: DataFrame) -> DataFrame:
    """The sessionize-and-join core on an arbitrary (user_id,
    event_id, event_type, tus) frame — factored out so the semantic
    tests can drive it with crafted gap-boundary / cap-overflow
    timelines; q_session_paths feeds it the fixture."""
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    d = d.withColumn("prev_tus", F.lag("tus").over(w))
    d = d.withColumn(
        "sess",
        F.sum(
            (
                F.col("prev_tus").isNull()
                | (F.col("tus") - F.col("prev_tus") > F.lit(_SESSION_GAP_US))
            ).cast("long")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = d.groupBy("user_id", "sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("tus", "event_id", "event_type"))
                    ),
                    1,
                    _PATH_CAP,
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


@register("q_session_paths", oracle=_SESSION_PATHS_ORACLE, tags=("analytics",))
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top click-paths: gap-sessionize each user's timeline (30-min
    inactivity, the W3 rule), join the session's first 8 (_PATH_CAP)
    event types into a '>'-separated path string, and count sessions
    and distinct users per path.  The cap bounds the path vocabulary
    (and the per-session array) regardless of session length; both
    windows and the path build share ONE user_id partitioning, and the
    final aggregate's cardinality is the path vocabulary — tiny."""
    events = load_table(spark, sf_dir, "events")
    return session_paths(
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        )
    )


_ROLLING_ACTIVE_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), mx AS (
  SELECT MAX(day) AS m FROM d
), r AS (
  SELECT d.user_id, d.day + g.i AS day FROM d, range(0, 7) g(i), mx
  WHERE d.day + g.i <= mx.m
), wau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
  FROM r GROUP BY day
), dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY day
)
SELECT w.day, COALESCE(dau.dau, 0) AS dau, w.wau7
FROM wau w LEFT JOIN dau ON w.day = dau.day
"""


@register("q_rolling_active_users", oracle=_ROLLING_ACTIVE_ORACLE, tags=("analytics",))
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling 7-day WAU per day.  A rolling COUNT(DISTINCT)
    admits no window form; the scalable identity is the day-stamp
    explode: each distinct (user, active-day) pair contributes the
    user to the 7 window-END days it keeps active, so WAU(d) =
    COUNT(DISTINCT user) over stamps landing on d.  Data volume is
    7 × |distinct pairs| — a constant fan-out, all hash aggregates,
    no global window anywhere.  Trailing stamps past the last
    observed day are trimmed against a broadcast scalar max.

    The distinct (user, day) frame is PINNED (round-15, deferred from
    round 14's draw): the max-day, stamp-explode and DAU legs each
    re-ran the events scan AND the distinct shuffle — three corpus
    passes folded into one (`pin:events`).  The pinned frame is the
    active-pair set (users x active days), already deduplicated —
    far below the event count it summarizes."""
    from flink_streaming_example_spark.operators import pinning

    events = load_table(spark, sf_dir, "events")
    d = pinning.pin(
        events.select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}").alias("day"),
        )
        .distinct(),
        "q_rolling_active_users:d",
    )
    mx = d.agg(F.max("day").alias("m"))
    r = (
        d.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
            "m",
        )
        .where(F.col("day") <= F.col("m"))
    )
    wau = r.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("wau7")
    )
    dau = d.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    return wau.join(dau, "day", "left").select(
        "day", F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"), "wau7"
    )


# Pareto banding: band = rev_cents >> 20 (~$10k-wide revenue bands).
# Band index is monotone in revenue, so global descending order =
# (band DESC, rev DESC, custkey ASC) and ties can never straddle a
# band boundary (equal revenue -> equal band).
_PARETO_SHIFT = 20

_PARETO_ORACLE = """
WITH rev AS (
  SELECT o_custkey AS c_custkey,
    CAST(SUM(CAST(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6)) * 100
              AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey
), c AS (
  SELECT c_custkey, rev_cents,
    CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, c_custkey
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM rev
)
SELECT c_custkey, rev_cents, cum_cents,
  CAST(cum_cents * 5 <= (SELECT SUM(rev_cents) FROM rev) * 4 AS BIGINT)
    AS in_top80
FROM c
"""


def pareto_cum(rev: DataFrame) -> DataFrame:
    """The banded distributed prefix-sum on an arbitrary (c_custkey,
    rev_cents) frame — factored out so the property fuzz can hammer
    band-boundary ties against a plain global-window reference;
    q_pareto feeds it the orders revenue rollup."""
    rev = rev.withColumn("band", F.shiftright(F.col("rev_cents"), _PARETO_SHIFT))
    wl = (
        Window.partitionBy("band")
        .orderBy(F.desc("rev_cents"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rev = rev.withColumn("local_cum", F.sum("rev_cents").over(wl))
    bands = rev.groupBy("band").agg(F.sum("rev_cents").alias("band_total"))
    wb = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bands = bands.select(
        "band",
        F.coalesce(F.sum("band_total").over(wb), F.lit(0)).alias("band_off"),
    )
    total = rev.agg(F.sum("rev_cents").alias("grand_total"))
    return (
        rev.join(F.broadcast(bands), "band")
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            "rev_cents",
            (F.col("band_off") + F.col("local_cum")).alias("cum_cents"),
            (
                (F.col("band_off") + F.col("local_cum")) * 5
                <= F.col("grand_total") * 4
            )
            .cast("long")
            .alias("in_top80"),
        )
    )


@register("q_pareto", oracle=_PARETO_ORACLE, tags=("analytics",))
def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 report): customers ranked by
    exact revenue-in-cents, cumulative revenue down the ranking, and
    an in_top80 flag for the prefix covering ≤80% of total revenue.

    A global running sum is the textbook single-partition-window trap;
    this is the distributed two-pass form instead: band rows by
    revenue magnitude (rev_cents >> 20 — _PARETO_SHIFT — monotone in
    revenue), compute the running sum WITHIN each band (partitioned
    window), aggregate one total per band, prefix-sum the band totals
    on the band-count-sized side (hundreds of rows at any scale), and
    broadcast the exclusive band offsets back.  cum = band_offset +
    local_cum — bit-equal to the oracle's global window, with no
    data-scale single-partition stage anywhere.  Revenue is summed in
    integer cents via the shortest-repr decimal cast (functions/
    stable.py parity note).

    The per-customer revenue rollup is PINNED (round-14, VERDICT r13
    item 3): pareto_cum's local-window, band-total and grand-total
    legs previously each re-ran the orders aggregate — three orders
    scans folded into one (`pin:orders`).  The pinned frame is
    customer-sized (already aggregated), not the orders corpus."""
    from flink_streaming_example_spark.operators import pinning

    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(30,6)") * 100).cast("long")
    rev = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(cents).alias("rev_cents")
    )
    return pareto_cum(pinning.pin(rev, "q_pareto:rev"))


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


_HEAVY_CHANGE_ORACLE = f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), bounds AS (
  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM b
), c AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
    CAST(SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM b, bounds GROUP BY user_id
)
SELECT user_id, cnt_a, cnt_b,
  CAST(ABS(cnt_b - cnt_a) AS BIGINT) AS abs_change
FROM c ORDER BY abs_change DESC, user_id LIMIT 30
"""


@register("q_heavy_change", oracle=_HEAVY_CHANGE_ORACLE, tags=("analytics",))
def q_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-change detection: the 30 users whose activity shifted
    most between the first and second half of the timeline (split at
    the midpoint day, a broadcast scalar).  The frequency-CHANGE
    analogue of q_heavy_hitters — what an abuse/drift monitor ranks.
    One conditional hash aggregate keyed by user, then a global top-k
    (TakeOrderedAndProject — a per-partition heap + driver merge of 30
    rows, never a global sort); ties broken by user_id for a total
    order."""
    events = load_table(spark, sf_dir, "events")
    b = events.select(
        "user_id",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}").alias("day"),
    )
    bounds = b.agg(
        F.expr("(MIN(day) + MAX(day) + 1) div 2").alias("mid")
    )
    c = (
        b.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("day") < F.col("mid")).cast("long")).alias("cnt_a"),
            F.sum((F.col("day") >= F.col("mid")).cast("long")).alias("cnt_b"),
        )
    )
    c = c.withColumn("abs_change", F.abs(F.col("cnt_b") - F.col("cnt_a")))
    return c.orderBy(F.desc("abs_change"), F.asc("user_id")).limit(30)


_TIME_TO_CONVERT_ORACLE = f"""
WITH s AS (
  SELECT user_id, MIN(ts) AS st FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS pt FROM events e
  JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.st GROUP BY e.user_id
), d AS (
  SELECT s.user_id, epoch_us(s.st) // {_WEEK_US} AS cohort_wk,
    epoch_us(p.pt) - epoch_us(s.st) AS delta_us
  FROM s JOIN p ON s.user_id = p.user_id
), r AS (
  SELECT cohort_wk, delta_us,
    ROW_NUMBER() OVER (PARTITION BY cohort_wk
                       ORDER BY delta_us, user_id) AS rn,
    COUNT(*) OVER (PARTITION BY cohort_wk) AS n
  FROM d
)
SELECT cohort_wk, CAST(n AS BIGINT) AS n_converted,
  CAST(delta_us AS BIGINT) AS p50_us
FROM r WHERE rn = (n + 1) // 2
"""


@register(
    "q_time_to_convert", oracle=_TIME_TO_CONVERT_ORACLE, tags=("analytics",)
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time-to-convert per signup cohort: for users whose first
    purchase strictly follows their first signup, the exact lower-
    median (integer-rank selection, the q_mad discipline) of the
    conversion delay, grouped by signup week.  The funnel chain's two
    per-user MINs share one user_id partitioning; the median window
    sorts only the CONVERTED-USER deltas per cohort — weeks × small.

    The first-signup frame is PINNED (round 15): it feeds both the
    purchase-filter join and the cohort join, and unpinned each
    reference re-ran the signup scan + per-user MIN shuffle.  The
    pinned frame is signup-user-sized; the one remaining events scan
    is the purchase leg — a different filter of the fact, structural
    (the q_merge_into class)."""
    from flink_streaming_example_spark.operators import pinning

    events = load_table(spark, sf_dir, "events")
    s = pinning.pin(
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st")),
        "q_time_to_convert:s",
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    d = s.join(p, "user_id").select(
        "user_id",
        F.expr(f"unix_micros(CAST(st AS TIMESTAMP)) div {_WEEK_US}").alias(
            "cohort_wk"
        ),
        (
            F.unix_micros(F.col("pt").cast("timestamp"))
            - F.unix_micros(F.col("st").cast("timestamp"))
        ).alias("delta_us"),
    )
    w = Window.partitionBy("cohort_wk").orderBy("delta_us", "user_id")
    wn = Window.partitionBy("cohort_wk")
    r = d.select(
        "cohort_wk",
        "delta_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "cohort_wk",
        F.col("n").cast("long").alias("n_converted"),
        F.col("delta_us").cast("long").alias("p50_us"),
    )


# Deterministic 50/50 assignment off the portable md5 integer hash
# (sampling.py's idiom): variant = md5_int(user_id) % 2 — stable
# across engines, partitionings and reruns, and uncorrelated with
# user_id parity (the thing naive id % 2 assignment gets wrong when
# ids encode signup order).
_AB_ORACLE = """
WITH a AS (
  SELECT user_id,
    CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 2 AS variant
  FROM (SELECT DISTINCT user_id FROM events)
), conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), spend AS (
  SELECT user_id,
    CAST(SUM(CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
             AS BIGINT)) AS BIGINT) AS v_micro
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT a.variant,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_converted,
  CAST(COALESCE(SUM(spend.v_micro), 0) AS BIGINT) AS total_value_micro
FROM a
LEFT JOIN conv ON a.user_id = conv.user_id
LEFT JOIN spend ON a.user_id = spend.user_id
GROUP BY a.variant
"""


@register("q_ab_experiment", oracle=_AB_ORACLE, tags=("analytics",))
def q_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-assigned 50/50 (comment
    above), per variant the user count, converted-user count and the
    exact micro-scaled purchase value — the numerators and
    denominators of conversion rate and ARPU, emitted as integers so
    the caller (not the engine) does the one float division.

    Single-pass since round 15 (the three-legged assign/conv/spend
    join re-read events per leg): ONE conditional per-user aggregate
    subsumes all three — every distinct user appears in the groupBy
    (assign's distinct), max(is-purchase) is the conversion flag
    (conv's distinct-join), the filtered sum is the spend (null when
    the user never purchased, exactly conv's left-join semantics) —
    then the 2-row variant rollup folds it.  One events scan, one
    user_id exchange, no pin needed."""
    events = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    per_user = events.groupBy("user_id").agg(
        F.max(F.when(is_purchase, F.lit(1)).otherwise(F.lit(0))).alias(
            "converted"
        ),
        F.sum(
            F.when(
                is_purchase,
                (F.col("value").cast("decimal(30,6)") * 1000000).cast(
                    "long"
                ),
            )
        ).alias("v_micro"),
    )
    return (
        per_user.select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("variant"),
            "converted",
            "v_micro",
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.sum(F.coalesce(F.col("v_micro"), F.lit(0)))
            .cast("long")
            .alias("total_value_micro"),
        )
    )


_GAP_US = 6 * 3_600 * 1_000_000
_CONC_SHIFT = 35  # ~9.5h time bands for the boundary prefix sum

_MAX_CONC_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
          OR ts - lag(ts) OVER w > INTERVAL '6 hours'
         THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sess AS (
  SELECT epoch_us(MIN(ts)) AS s_us,
         epoch_us(MAX(ts)) + {_GAP_US} AS e_us
  FROM numbered GROUP BY user_id, sid
), b AS (
  SELECT s_us AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS t, -1 AS delta FROM sess
), g AS (
  SELECT t, delta, CAST(SUM(delta) AS BIGINT) AS contrib
  FROM b GROUP BY t, delta
), r AS (
  SELECT t,
    SUM(contrib) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING)
      AS cur
  FROM g
)
SELECT
  CAST((SELECT MAX(cur) FROM r) AS BIGINT) AS peak,
  CAST((SELECT MIN(t) FROM r WHERE cur = (SELECT MAX(cur) FROM r))
       AS BIGINT) AS peak_ts_us
"""


@register("q_max_concurrency", oracle=_MAX_CONC_ORACLE, tags=("analytics",))
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency (the gauge/interval-stabbing query): the
    maximum number of simultaneously-active user sessions and the
    first instant it is reached.  Sessions are the same objects
    q_session_window emits (6h inactivity gap, half-open
    [first, last+gap)), turned into +1/-1 boundary events; at equal
    timestamps ends sort before starts (delta ASC), so back-to-back
    sessions never double-count.  The running sum down the boundary
    order is the banded prefix decomposition again (ts>>35 ≈ 9.5h
    bands — band count is time-horizon-sized at any data scale):
    per-(t,delta) aggregation first, so the sweep runs over
    boundary-distinct rows, then MAX and first-argmax as two scalar
    aggregates broadcast-joined — no data-scale single-partition
    stage, nothing collected.

    One events pass (plan-gated): the boundary pair explodes off a
    SINGLE sess reference (the union form referenced sess twice), and
    the windowed boundary frame is localCheckpoint-pinned before the
    band rollup / argmax re-reference it — unpinned, the subtree
    fan-out re-derived the session aggregate 8 times at the events
    scan (caught when round 11 de-vacuumed test_fact_scanned_once).
    The pinned frame is boundary-distinct-sized (<= 2 sessions rows);
    the previous call's checkpoint is released on the next invocation
    (pinning.pin superseded-release, scan-audited via its pre-pin
    hook)."""
    from flink_streaming_example_spark.operators.pinning import pin

    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("e_us"),
        )
    )
    b = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e_us").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("x")
    ).select("x.t", "x.delta")
    g = (
        b.groupBy("t", "delta")
        .agg(F.sum("delta").cast("long").alias("contrib"))
        .withColumn("band", F.shiftright(F.col("t"), _CONC_SHIFT))
    )
    wl = (
        Window.partitionBy("band")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = pin(
        g.withColumn("local_cum", F.sum("contrib").over(wl)),
        "q_max_concurrency",
    )
    bands = g.groupBy("band").agg(F.sum("contrib").alias("band_total"))
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    bands = bands.select(
        "band",
        F.coalesce(F.sum("band_total").over(wb), F.lit(0)).alias("band_off"),
    )
    r = g.join(F.broadcast(bands), "band").select(
        "t", (F.col("band_off") + F.col("local_cum")).alias("cur")
    )
    peak = r.agg(F.max("cur").alias("peak"))
    return (
        r.crossJoin(F.broadcast(peak))
        .where(F.col("cur") == F.col("peak"))
        .agg(
            F.first("peak").alias("peak"),
            F.min("t").alias("peak_ts_us"),
        )
        .select(
            F.col("peak").cast("long").alias("peak"),
            F.col("peak_ts_us").cast("long").alias("peak_ts_us"),
        )
    )


def _banded_rank(df: DataFrame, key_col: str, shift: int, out: str) -> DataFrame:
    """Global ROW_NUMBER over (key ASC, cust ASC) without a single-
    partition window: rank within key>>shift bands, then add the
    broadcast exclusive band-count offsets (the decile-lift/AUC
    decomposition, factored because RFM needs it three times).
    shiftright is arithmetic, so negative keys band monotonically too
    — DESC orderings pass the negated metric."""
    b = df.withColumn("_band", F.shiftright(F.col(key_col), shift))
    wl = Window.partitionBy("_band").orderBy(F.asc(key_col), F.asc("cust"))
    b = b.withColumn("_lrn", F.row_number().over(wl))
    bands = b.groupBy("_band").agg(F.count(F.lit(1)).alias("_bn"))
    wb = Window.orderBy("_band").rowsBetween(Window.unboundedPreceding, -1)
    bands = bands.select(
        "_band",
        F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_off"),
    )
    return (
        b.join(F.broadcast(bands), "_band")
        .withColumn(out, F.col("_off") + F.col("_lrn"))
        .drop("_band", "_lrn", "_off")
    )


_RFM_ANCHOR = "1998-12-31"  # just past the orders fixture horizon

_RFM_ORACLE = f"""
WITH cm AS (
  SELECT o_custkey AS cust,
    -CAST(datediff('day', CAST(MAX(o_orderdate) AS DATE),
                   DATE '{_RFM_ANCHOR}') AS BIGINT) AS neg_recency,
    CAST(COUNT(*) AS BIGINT) AS freq,
    CAST(SUM(CAST(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6))
                  * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT cents,
    ROW_NUMBER() OVER (ORDER BY neg_recency, cust) AS rr,
    ROW_NUMBER() OVER (ORDER BY freq, cust) AS rf,
    ROW_NUMBER() OVER (ORDER BY cents, cust) AS rm,
    COUNT(*) OVER () AS n
  FROM cm
)
SELECT concat(CAST((rr - 1) * 4 // n + 1 AS VARCHAR),
              CAST((rf - 1) * 4 // n + 1 AS VARCHAR),
              CAST((rm - 1) * 4 // n + 1 AS VARCHAR)) AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(cents) AS BIGINT) AS total_cents
FROM r GROUP BY 1
"""


@register("q_rfm_segments", oracle=_RFM_ORACLE, tags=("analytics",))
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value cut: per ordering
    customer, Recency (days from last order to the fixture horizon),
    Frequency (order count) and Monetary (exact cents) are each
    quartile-scored 1..4 (4 best) and customers roll up per 3-digit
    segment.  Equal-frequency quartiles use the deterministic closed
    form (rank-1)*4 div n + 1 over a banded global ROW_NUMBER
    (_banded_rank — no single-partition window, no builtin NTILE
    remainder ambiguity), with custkey as the total-order tiebreak so
    both engines rank identically.  Recency ranks DESC via the negated
    metric (arithmetic shiftright keeps negative bands monotonic).
    Three rank passes = three bounded shuffles over the CUSTOMER
    aggregate (orders-table cardinality never re-shuffled); band
    tables are value-range-sized broadcasts.  The customer aggregate
    is localCheckpoint-pinned: each _banded_rank references its input
    twice (ranked rows + band counts), so the unpinned chain re-derived
    the aggregate 2^3 + 1 = 9 times AT THE ORDERS SCAN (caught when
    round 11 de-vacuumed test_fact_scanned_once); pinned, orders is
    read once and the three passes shuffle only customer-sized rows.
    The previous call's checkpoint is released on the next invocation
    (pinning.pin superseded-release, scan-audited via its pre-pin
    hook)."""
    from flink_streaming_example_spark.operators.pinning import pin

    o = load_table(spark, sf_dir, "orders")
    cm = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        (
            -F.datediff(
                F.lit(_RFM_ANCHOR).cast("date"),
                F.max(F.col("o_orderdate").cast("date")),
            )
        )
        .cast("long")
        .alias("neg_recency"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(30,6)") * 100).cast("long")
        ).alias("cents"),
    )
    cm = pin(cm, "q_rfm_segments")
    r = _banded_rank(cm, "neg_recency", 6, "rr")
    r = _banded_rank(r, "freq", 2, "rf")
    r = _banded_rank(r, "cents", 21, "rm")
    tot = cm.agg(F.count(F.lit(1)).alias("n"))
    q = r.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.concat(
            (F.expr("(rr - 1) * 4 div n") + 1).cast("string"),
            (F.expr("(rf - 1) * 4 div n") + 1).cast("string"),
            (F.expr("(rm - 1) * 4 div n") + 1).cast("string"),
        ).alias("segment"),
    )
    return q.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


_WEEK_US = 7 * 86_400_000_000

_LTV_ORACLE = f"""
WITH f AS (
  SELECT user_id,
    MIN(epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US}) AS cw
  FROM events GROUP BY user_id
), sz AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_users FROM f GROUP BY cw
), e AS (
  SELECT f.cw,
    epoch_us(CAST(ev.ts AS TIMESTAMP)) // {_WEEK_US} - f.cw AS age,
    CASE WHEN ev.event_type = 'purchase'
         THEN CAST(CAST(CAST(ev.value AS STRING) AS DECIMAL(30,6))
                   * 1000000 AS BIGINT)
         ELSE 0 END AS rev
  FROM events ev JOIN f ON ev.user_id = f.user_id
), g AS (
  SELECT cw, age, CAST(SUM(rev) AS BIGINT) AS rev_micro
  FROM e GROUP BY cw, age
)
SELECT g.cw AS cohort_week, g.age AS age_weeks, sz.n_users, g.rev_micro,
  CAST(SUM(g.rev_micro) OVER (PARTITION BY g.cw ORDER BY g.age
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS cum_rev_micro
FROM g JOIN sz ON g.cw = sz.cw
"""


@register("q_ltv_cohorts", oracle=_LTV_ORACLE, tags=("analytics",))
def q_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — the revenue companion to the retention
    triangle: users cohorted by first-seen week, purchase revenue
    (exact micros) rolled up per (cohort, age-in-weeks) and CUMULATED
    down each cohort's age axis, alongside the cohort's size, so
    cum_rev_micro / n_users is the per-user LTV trajectory.  Ages
    appear whenever the cohort had ANY activity that week (zero-
    revenue weeks included — the curve's flat segments are data, and
    the presence rule is mirrored exactly in the oracle).  Scale: one
    user_id exchange produces first-seen weeks, the fact join reuses
    the same key, the rollup is (weeks x ages)-sized — horizon², not
    event-count — and the cumulative window partitions by cohort.

    The first-seen frame is PINNED (round 15): the cohort-size leg
    and the fact join each re-ran the events scan + per-user MIN
    shuffle.  The pinned frame is user-sized; the one remaining
    events scan is the fact join's own read — irreducible (the ages
    need every event) and structural."""
    from flink_streaming_example_spark.operators import pinning

    ev = load_table(spark, sf_dir, "events")
    wk = F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_WEEK_US}")
    f = pinning.pin(
        ev.groupBy("user_id").agg(F.min(wk).alias("cw")),
        "q_ltv_cohorts:f",
    )
    sz = f.groupBy("cw").agg(F.count(F.lit(1)).alias("n_users"))
    rev = F.when(
        F.col("event_type") == "purchase",
        (F.col("value").cast("decimal(30,6)") * 1_000_000).cast("long"),
    ).otherwise(F.lit(0))
    e = ev.join(f, "user_id").select(
        "cw", (wk - F.col("cw")).alias("age"), rev.alias("rev")
    )
    g = e.groupBy("cw", "age").agg(F.sum("rev").cast("long").alias("rev_micro"))
    w = (
        Window.partitionBy("cw")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.withColumn("cum_rev_micro", F.sum("rev_micro").over(w).cast("long"))
        .join(F.broadcast(sz), "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            F.col("age").alias("age_weeks"),
            "n_users",
            "rev_micro",
            "cum_rev_micro",
        )
    )


_FREQ_OF_FREQ_ORACLE = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY n_events
"""


@register("q_freq_of_freq", oracle=_FREQ_OF_FREQ_ORACLE, tags=("analytics",))
def q_freq_of_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies — the heavy-tail census (how many
    users produced exactly k events) behind Good-Turing smoothing,
    bot/outlier triage, and shuffle-skew forecasting: the k-spectrum
    IS the histogram that predicts whether a keyed job needs salting.
    Two hash aggregations, the second over a domain bounded by
    max-activity — never data-sized."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_user.groupBy("n_events").agg(
        F.count(F.lit(1)).alias("n_users")
    )


_ATTRIBUTION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
    CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(30,6)) * 1000000
         AS BIGINT) AS vi,
    MIN(CASE WHEN event_type = 'click' THEN
          CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
        END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS first_click_day
  FROM events
)
SELECT COALESCE(first_click_day, -1) AS attrib_day,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(vi) AS BIGINT) AS total_micro
FROM seq WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("q_attribution", oracle=_ATTRIBUTION_ORACLE, tags=("analytics",))
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution — every purchase's revenue credited to
    the day of the user's FIRST click at or before it (the marketing
    analytics companion to q_funnel_steps / q_time_to_convert; -1
    collects purchases with no preceding click).  The first-click
    lookup is a running MIN over a conditional day (min == first
    because the frame is event-time ordered, and MIN ignores the
    non-click NULLs on both engines — no IGNORE NULLS dialect
    dependence); revenue rides as exact micro-ints.  One window
    exchange keyed by user_id, then a day-cardinality rollup."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "event_type",
        F.expr(
            "CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT)"
        ).alias("vi"),
        F.min(
            F.when(F.col("event_type") == "click", day)
        ).over(w).alias("first_click_day"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("first_click_day"), F.lit(-1)).alias(
                "attrib_day"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("vi").alias("total_micro"),
        )
    )
