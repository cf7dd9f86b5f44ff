"""Tie-order semantics of the CEP funnel (SURVEY.md §2.8 P4).

Events sharing one timestamp make the `last_value ... 1 PRECEDING`
frames order-sensitive; the (ts, event_id) tiebreak must (a) be a total
order so results are deterministic, and (b) agree exactly with the
DuckDB oracle's window semantics.  The round-3 fixture regression
(1000x-compressed timestamps) manufactured mass ties, so this pins the
behavior on purpose-built tie-heavy data.
"""

from __future__ import annotations

import duckdb

from flink_streaming_example_spark.operators.cep import (
    _FUNNEL_ORACLE,
    funnel_matches,
)
from flink_streaming_example_spark.testing import compare_frames

T0 = "2024-01-01 00:00:00"
T1 = "2024-01-02 00:00:00"
T2 = "2024-01-20 00:00:00"  # > 7 days after T0/T1

# (user_id, event_id, event_type, ts)
ROWS = [
    # user 1: click/view/purchase all at the SAME instant.  Frame order
    # is click(1) -> view(2) -> purchase(3); last_click == last_view so
    # the strict click < view comparison must REJECT the match.
    (1, 1, "click", T0),
    (1, 2, "view", T0),
    (1, 3, "purchase", T0),
    # user 2: click and view tied, purchase later; still rejected for
    # the same strict-inequality reason.
    (2, 4, "click", T0),
    (2, 5, "view", T0),
    (2, 6, "purchase", T1),
    # user 3: proper funnel, purchase tied WITH the view.  The 1
    # PRECEDING frame ends before the purchase row, so the tied view is
    # visible (event_id orders it earlier) and the match FIRES.
    (3, 7, "click", T0),
    (3, 8, "view", T1),
    (3, 9, "purchase", T1),
    # user 4: view arrives before click at the same instant (event_id
    # decides: view=10 < click=11).  last_click == last_view at the
    # purchase -> rejected.
    (4, 10, "view", T0),
    (4, 11, "click", T0),
    (4, 12, "purchase", T1),
    # user 5: valid order but click -> purchase span exceeds 7 days.
    (5, 13, "click", T0),
    (5, 14, "view", T1),
    (5, 15, "purchase", T2),
    # user 6: two purchases tied at the same instant after a funnel —
    # both fire, frames identical.
    (6, 16, "click", T0),
    (6, 17, "view", T1),
    (6, 18, "purchase", T1),
    (6, 19, "purchase", T1),
]


def _events_df(spark):
    return spark.createDataFrame(
        [(u, e, t, ts) for (u, e, t, ts) in ROWS],
        "user_id long, event_id long, event_type string, ts string",
    ).selectExpr(
        "user_id", "event_id", "event_type", "cast(ts as timestamp_ntz) ts"
    )


def test_funnel_tie_semantics_exact(spark):
    got = sorted(
        r.purchase_id
        for r in funnel_matches(_events_df(spark)).collect()
    )
    # users 1/2/4 rejected (tied click/view), 5 rejected (window), 3
    # fires once, 6 fires twice.
    assert got == [9, 18, 19]


def test_funnel_ties_match_duckdb_oracle(spark):
    pdf = _events_df(spark).toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(_FUNNEL_ORACLE).df()
    got = funnel_matches(_events_df(spark)).toPandas()
    result = compare_frames(got, want)
    assert result.ok, result.detail
    con.close()
