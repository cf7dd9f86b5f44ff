"""Fixed-pattern detection (SURVEY.md §2.8 P4, the CEP row previously
excluded): Flink's `Pattern.begin("click").followedBy("view").
followedBy("purchase").within(Time.days(7))` for a FIXED pattern needs
no NFA — it is expressible as conditional last-value window chains,
which keeps it declarative, oracle-checkable, and inside codegen.

Semantics (deterministic, mirrored in the oracle): for every purchase,
the match uses each user's LATEST prior view and LATEST prior click
(Flink CEP's "relaxed contiguity" with last-match selection); the
pattern fires when latest-click < latest-view < purchase and the
click→purchase span is within 7 days.

Scale notes (100 TB): one shuffle by user_id, then a linear per-key
scan (window frame is running, not re-scanned per row).  General
dynamic patterns (arbitrary NFA, loops) would go to
applyInPandasWithState keeping the automaton state per key — same
harness as streaming/queries.py q_stateful_counter; the fixed-pattern
form here is the right tool when the pattern is known at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_FUNNEL_ORACLE = """
WITH typed AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), marked AS (
  SELECT *,
    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS last_click_ts,
    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS last_view_ts
  FROM typed
)
SELECT user_id, event_id AS purchase_id, last_click_ts, last_view_ts,
       ts AS purchase_ts
FROM marked
WHERE event_type = 'purchase'
  AND last_click_ts IS NOT NULL AND last_view_ts IS NOT NULL
  AND last_click_ts < last_view_ts
  AND last_click_ts >= ts - INTERVAL 7 DAY
"""


def funnel_matches(ev: DataFrame) -> DataFrame:
    """The funnel automaton over any (user_id, event_id, event_type, ts)
    frame — split out so tie-heavy synthetic inputs can be pinned in
    tests (equal timestamps make the frame order depend on the
    (ts, event_id) tiebreak, which must agree with the oracle)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        last_click.alias("last_click_ts"),
        last_view.alias("last_view_ts"),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .filter(
            F.col("last_click_ts").isNotNull()
            & F.col("last_view_ts").isNotNull()
            & (F.col("last_click_ts") < F.col("last_view_ts"))
            & (F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "last_click_ts",
            "last_view_ts",
            F.col("ts").alias("purchase_ts"),
        )
    )


@register("q_cep_funnel", oracle=_FUNNEL_ORACLE, tags=("cep", "window"))
def q_cep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (fixed pattern): click -> view -> purchase funnel within 7
    days per user, via conditional last-value window chains (module
    docstring has the exact match semantics and the NFA escape hatch
    for dynamic patterns)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return funnel_matches(ev)
