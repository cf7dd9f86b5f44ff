"""Nearest as-of tie semantics: an event exactly equidistant between
two orders must deterministically pick the EARLIER order date (the
(dist, date) pair ordering both the Spark min_by and the oracle's
min-dist-then-min-date encode)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_nearest_asof_tie_breaks_to_earlier_date(spark):
    ev = spark.createDataFrame(
        [(1, 10, "2024-01-10 12:00:00")],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    orders = spark.createDataFrame(
        # equidistant: 12h before and 12h after the event
        [(10, "2024-01-10 00:00:00"), (10, "2024-01-11 00:00:00")],
        "o_custkey long, o_orderdate string",
    ).select(
        "o_custkey", F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate")
    )
    dist = F.abs(
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    )
    got = (
        ev.join(orders, ev.user_id == orders.o_custkey, "left")
        .select("event_id", "user_id", "o_orderdate", dist.alias("dist"))
        .groupBy("event_id", "user_id")
        .agg(
            F.min_by(
                "o_orderdate", F.struct(F.col("dist"), F.col("o_orderdate"))
            ).alias("nearest_order_date")
        )
        .collect()
    )
    assert str(got[0].nearest_order_date) == "2024-01-10 00:00:00"
