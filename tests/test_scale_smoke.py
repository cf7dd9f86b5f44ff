"""Volume smoke tests: the fixture tables top out at ~600k rows, so
these generate 20M-row synthetic frames (spark.range — no driver
fixtures involved) whose exact answers are known analytically, and
check the same operator shapes the engine ships: windowed aggregation,
exact dedup, broadcast enrichment.  The point is not speed measurement
(bench.py owns that) but that the plans hold up when the input is
~100x the fixture: partial aggregation before the shuffle, broadcast
staying broadcast, no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N = 20_000_000
USERS = 100_000


def _events_like(spark):
    # deterministic synthetic event stream: id -> (user, minute bucket)
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        (F.col("id") % USERS).alias("user_id"),
        F.timestamp_seconds(
            # hour-aligned base so the 86400-second span covers exactly
            # 24 tumbling 1h windows
            F.lit(1_699_999_200) + (F.col("id") % 86_400)
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )


def test_tumbling_window_20m_rows(spark):
    ev = _events_like(spark)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("n")
    )
    rows = agg.collect()
    # ids cover each of 86400 second-slots N/86400 times -> 24 windows,
    # 3600 slots each
    assert len(rows) == 24
    assert sum(r.n for r in rows) == N
    per_window = N // 86_400 * 3_600
    assert all(abs(r.n - per_window) <= 3_600 for r in rows)


def test_exact_dedup_20m_rows(spark):
    ev = _events_like(spark)
    # 200 duplicates of each user_id-key -> exactly USERS survivors
    survivors = ev.select("user_id").distinct().count()
    assert survivors == USERS


def test_broadcast_enrich_20m_rows(spark):
    ev = _events_like(spark)
    dim = spark.range(USERS).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 10).alias("segment"),
    )
    joined = ev.join(F.broadcast(dim), "user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    rows = joined.collect()
    assert len(rows) == 10
    assert sum(r.n for r in rows) == N
