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


def test_asof_hot_key_2_5m_rows(spark):
    """The joinless as-of's reason to exist: ONE pathological key
    holding every row.  2M events x 500k orders on a single key is
    10^12 candidate pairs for the old key-equi-join + aggregate shape
    (would never finish here); the union + running-carry shape sorts
    2.5M rows once and carries linearly.  Orders sit at t = i*1000 us,
    events at t = j*1000 + 500 us, so every event's backward match is
    analytically exact: its own floor(t/1000)*1000."""
    from flink_streaming_example_spark.operators.joins import _asof_backward

    n_ev, n_ord = 2_000_000, 500_000
    orders = spark.range(n_ord).select(
        F.lit(1).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1000)
        .cast("timestamp_ntz")
        .alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.timestamp_micros(F.col("id") * 1000)
        .cast("timestamp_ntz")
        .alias("ord_date"),
    )
    # events interleave the order grid, wrapping so every event has a
    # preceding order (j % n_ord keeps event times inside the grid)
    events = spark.range(n_ev).select(
        F.lit(1).alias("user_id"),
        F.timestamp_micros((F.col("id") % n_ord) * 1000 + 500)
        .cast("timestamp_ntz")
        .alias("t"),
        F.lit(1).alias("side"),
        F.col("id").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ord_date"),
    )
    got = _asof_backward(orders.unionByName(events))
    # event_id encodes its own event time, so the expected match is
    # recomputable without carrying t through the operator's projection
    wrong = got.filter(
        F.unix_micros(F.col("last_order_date").cast("timestamp"))
        != (F.col("event_id") % n_ord) * 1000
    ).count()
    assert wrong == 0
    assert got.count() == n_ev
