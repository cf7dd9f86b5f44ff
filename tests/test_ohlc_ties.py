"""OHLC open/close tie-breaking: the fixture has no duplicate
(user_id, ts) pairs at any SF, so the composite order key's event_id
term never decides in the registered key — this test feeds deliberate
same-microsecond events through the REAL q_ohlc expressions and pins
the selection against both the arithmetic rule and DuckDB's arg_min
on the identical composite."""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_streaming_example_spark.testing import compare_frames


def _bars(spark, pdf: pd.DataFrame):
    from pyspark.sql import functions as F

    from flink_streaming_example_spark.operators.windows import (
        ohlc_order_key,
    )

    sdf = spark.createDataFrame(pdf)
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    ok = ohlc_order_key(F.col("ts").cast("timestamp"), day)
    return (
        sdf.select(day.alias("wday"), "user_id", "event_id", "value", ok.alias("ok"))
        .groupBy("wday", "user_id")
        .agg(
            F.min_by("value", "ok").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ok").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def test_ohlc_ties_resolved_by_event_id(spark):
    ts = pd.Timestamp("2024-03-01 12:00:00.000123")
    pdf = pd.DataFrame(
        {
            # three same-microsecond events plus one later: open must be
            # the LOWEST event_id at the tied earliest instant, close
            # the highest event_id at the tied latest instant
            "event_id": [7, 3, 5, 9, 9000001],
            "ts": [ts, ts, ts, ts + pd.Timedelta(hours=1)] + [ts],
            "user_id": [1, 1, 1, 1, 2],
            "value": [70.0, 30.0, 50.0, 90.0, 11.0],
        }
    )
    got = _bars(spark, pdf).toPandas()
    u1 = got[got.user_id == 1].iloc[0]
    assert u1.open == 30.0  # event_id 3 wins the tied open
    assert u1.close == 90.0  # the strictly-later event wins close
    # same data through DuckDB's arg_min/arg_max on the identical key
    from flink_streaming_example_spark.operators.windows import (
        OHLC_ORDER_MULT,
    )

    con = duckdb.connect()
    con.register("e", pdf)
    want = con.execute(
        f"""
        SELECT date_trunc('day', ts) AS wday, user_id,
          arg_min(value, (epoch_us(ts) - epoch_us(date_trunc('day', ts)))
                         * {OHLC_ORDER_MULT} + event_id) AS open,
          MAX(value) AS high, MIN(value) AS low,
          arg_max(value, (epoch_us(ts) - epoch_us(date_trunc('day', ts)))
                         * {OHLC_ORDER_MULT} + event_id) AS close,
          COUNT(*) AS n_events
        FROM e GROUP BY 1, 2
        """
    ).df()
    result = compare_frames(got, want)
    assert result.ok, result.detail
