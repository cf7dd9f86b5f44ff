"""Nearest as-of tie semantics ON THE PRODUCTION PATH: the union +
bwd/fwd carry in operators/joins.py (_asof_nearest) must pick the
EARLIER order date when an event is exactly equidistant between two
orders, and must fall back to the only-available side when the other
carry is null.  Fixture parity at sf0.01 is unlikely to contain an
exactly-equidistant event, so the boundary is pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_example_spark.operators.joins import (
    _asof_backward,
    _asof_forward,
    _asof_nearest,
)

_UNION_SCHEMA = (
    "user_id long, t string, side int, event_id long, ord_date string"
)


def _union_df(spark, rows):
    """Build a stacked-timeline fixture with _asof_union's exact shape:
    (user_id, t, side, event_id, ord_date) with ntz timestamps."""
    return spark.createDataFrame(rows, _UNION_SCHEMA).select(
        "user_id",
        F.col("t").cast("timestamp_ntz").alias("t"),
        "side",
        "event_id",
        F.col("ord_date").cast("timestamp_ntz").alias("ord_date"),
    )


def test_equidistant_tie_breaks_to_earlier_date(spark):
    # one event at noon, orders exactly 12h before and 12h after
    u = _union_df(
        spark,
        [
            (10, "2024-01-10 00:00:00", 0, None, "2024-01-10 00:00:00"),
            (10, "2024-01-11 00:00:00", 0, None, "2024-01-11 00:00:00"),
            (10, "2024-01-10 12:00:00", 1, 1, None),
        ],
    )
    row = _asof_nearest(u).collect()[0]
    assert str(row.nearest_order_date) == "2024-01-10 00:00:00"
    assert row.dist_us == 12 * 3600 * 1_000_000


def test_null_forward_falls_back_to_backward(spark):
    # event after the only order: fwd carry is null -> bwd wins
    u = _union_df(
        spark,
        [
            (10, "2024-01-01 00:00:00", 0, None, "2024-01-01 00:00:00"),
            (10, "2024-06-01 00:00:00", 1, 1, None),
        ],
    )
    row = _asof_nearest(u).collect()[0]
    assert str(row.nearest_order_date) == "2024-01-01 00:00:00"


def test_null_backward_falls_back_to_forward(spark):
    # event before the only order: bwd carry is null -> fwd wins
    u = _union_df(
        spark,
        [
            (10, "2024-06-01 00:00:00", 0, None, "2024-06-01 00:00:00"),
            (10, "2024-01-01 00:00:00", 1, 1, None),
        ],
    )
    row = _asof_nearest(u).collect()[0]
    assert str(row.nearest_order_date) == "2024-06-01 00:00:00"


def test_same_instant_order_is_distance_zero_on_both_sides(spark):
    # an order AT the event instant satisfies both <= and >=; either
    # pick emits the same value and dist must be exactly 0
    u = _union_df(
        spark,
        [
            (10, "2024-01-10 12:00:00", 0, None, "2024-01-10 12:00:00"),
            (10, "2024-01-10 12:00:00", 1, 1, None),
        ],
    )
    row = _asof_nearest(u).collect()[0]
    assert str(row.nearest_order_date) == "2024-01-10 12:00:00"
    assert row.dist_us == 0
    # and the directional carries both see the same-instant order
    b = _asof_backward(u).collect()[0]
    f = _asof_forward(u).collect()[0]
    assert str(b.last_order_date) == "2024-01-10 12:00:00"
    assert str(f.next_order_date) == "2024-01-10 12:00:00"
