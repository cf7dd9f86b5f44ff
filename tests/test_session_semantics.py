"""Session-window boundary semantics on synthetic data (SURVEY §7
hardness #1): events placed at EXACT gap multiples pin down Spark's
convention — an event at exactly last+gap still EXTENDS the session
(merge when diff <= gap; a new session starts only when diff > gap).
The fixture's irregular timestamps can't hit that boundary, which is
exactly why this synthetic case exists: the `>=` oracle passed the
fixture parity test while being wrong at the boundary."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_streaming_example_spark.testing import compare_frames

GAP_MIN = 10


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for user in range(3):
        t = base
        for i in range(40):
            # mix: exact-gap steps (boundary!), sub-gap, super-gap
            step = rng.choice([GAP_MIN, GAP_MIN, GAP_MIN - 3, GAP_MIN + 7, 1])
            t = t + dt.timedelta(minutes=step)
            rows.append((user, t))
    return pd.DataFrame(rows, columns=["user_id", "ts"])


def test_session_window_boundary_matches_oracle(spark, events):
    sdf = spark.createDataFrame(events)
    got = (
        sdf.groupBy(
            F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    con = duckdb.connect()
    con.register("ev", events)
    want = con.execute(
        f"""
        WITH flagged AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL '{GAP_MIN} minutes'
                         THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT *, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
          ) AS sid FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '{GAP_MIN} minutes' AS session_end,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sid
        """
    ).df()
    # boundary must actually be exercised
    assert (want["n_events"] == 1).any() and (want["n_events"] > 1).any()
    result = compare_frames(got, want)
    assert result.ok, result.detail
