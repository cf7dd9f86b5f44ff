"""Semantic unit tests for the round-9 time-series / analytics family —
closed-form expectations on crafted micro-frames plus mathematical
invariants on the fixture output (the oracle parity in test_parity.py
proves cross-engine equality; these prove the operators compute the
RIGHT thing, not just the same thing twice)."""

from __future__ import annotations

import datetime

from hypothesis import given
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.01"

_SPECS = all_specs()


def _write_events(rows, out_dir, event_type="view"):
    """rows: (user_id, event_id, ts_str, value) -> out_dir/events.parquet
    with the FIXTURE's exact physical schema (timestamp[us], tz-naive)
    so load_table's schema-drift preflight accepts it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(rows, key=lambda r: r[1])
    table = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime.fromisoformat(r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                [r[4] if len(r) > 4 else event_type for r in rows],
                pa.string(),
            ),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{out_dir}/events.parquet")


def test_ewma_closed_form(spark, tmp_path):
    # one user, 20 events, value = i -> brute-force the truncated
    # binary-decay average and compare num/den exactly
    rows = [
        (1, i, f"2024-01-01T00:{i:02d}:00", float(i)) for i in range(20)
    ]
    _write_events(rows, str(tmp_path))
    got = {
        r["event_id"]: (r["ewma_num_micro"], r["ewma_den"])
        for r in _SPECS["q_ewma"].fn(spark, str(tmp_path)).collect()
    }
    for n in range(20):
        window = list(range(max(0, n - 15), n + 1))  # values == indices
        m = len(window)
        num = sum(
            v * (1 << (16 - m + j)) for j, v in enumerate(window)
        ) * 1_000_000
        den = (1 << 16) - (1 << (16 - m))
        assert got[n] == (num, den), f"event {n}"


def test_interpolate_exact_gap(spark, tmp_path):
    # two observations 4 buckets apart -> 3 interpolated rows on the
    # exact line between them; a third user with one event -> no grid
    rows = [
        (1, 0, "2024-01-01T00:00:00", 10.0),
        (1, 1, "2024-01-02T00:00:00", 50.0),  # 4 x 6h buckets later
        (2, 2, "2024-01-01T03:00:00", 7.0),
    ]
    _write_events(rows, str(tmp_path))
    out = _SPECS["q_interpolate"].fn(spark, str(tmp_path)).collect()
    u1 = sorted(
        ((r["bstart"], r["val_micro"], r["src"]) for r in out
         if r["user_id"] == 1),
    )
    assert [v for _, v, _ in u1] == [
        10_000_000, 20_000_000, 30_000_000, 40_000_000, 50_000_000
    ]
    assert [s for _, _, s in u1] == ["obs", "interp", "interp", "interp", "obs"]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["src"] == "obs"


def test_anomaly_zscore_crafted(spark, tmp_path):
    # 19 identical values + one far outlier: exactly the outlier trips
    # 3-sigma; all-identical key flags nothing
    rows = [
        (1, i, f"2024-01-01T00:{i:02d}:00", 10.0) for i in range(19)
    ] + [
        (1, 99, "2024-01-01T01:00:00", 1000.0),
    ] + [
        (2, 200 + i, f"2024-01-01T02:{i:02d}:00", 5.0) for i in range(10)
    ]
    _write_events(rows, str(tmp_path))
    got = {
        r["user_id"]: (r["n_events"], r["n_anomalies"])
        for r in _SPECS["q_anomaly_zscore"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == (20, 1)
    assert got[2] == (10, 0)


def test_rolling_corr_cauchy_schwarz_and_perfect_corr(spark, tmp_path):
    # fixture-wide invariant: corr_num^2 <= den_x * den_y (Cauchy-
    # Schwarz) — a wrong component formula breaks this immediately
    out = _SPECS["q_rolling_corr"].fn(spark, SF_DIR)
    bad = out.where(
        F.col("corr_num") * F.col("corr_num")
        > F.col("corr_den_x") * F.col("corr_den_y")
    ).count()
    assert bad == 0
    # crafted: x == y every day -> perfect correlation, num^2 == dx*dy
    rows = []
    for d in range(5):
        for i in range(d + 1):  # d+1 views AND d+1 purchases on day d
            rows.append(
                (1, 1000 + d * 40 + i, f"2024-01-0{d+1}T01:00:00", 1.0, "view")
            )
            rows.append(
                (1, 1000 + d * 40 + 20 + i, f"2024-01-0{d+1}T01:00:00", 1.0,
                 "purchase")
            )
    _write_events(rows, str(tmp_path))
    for r in _SPECS["q_rolling_corr"].fn(spark, str(tmp_path)).collect():
        if r["n_days"] >= 2:
            assert (
                r["corr_num"] * r["corr_num"]
                == r["corr_den_x"] * r["corr_den_y"]
            ), r
            assert r["corr_num"] > 0


def test_ntile_tile_sizes(spark):
    # ANSI NTILE: within each group, tile sizes differ by at most 1 and
    # larger tiles come first; sizes sum to the group size
    out = _SPECS["q_ntile"].fn(spark, SF_DIR).collect()
    by_prio: dict = {}
    for r in out:
        by_prio.setdefault(r["o_orderpriority"], []).append(
            (r["decile"], r["n_orders"])
        )
    for prio, tiles in by_prio.items():
        tiles.sort()
        sizes = [n for _, n in tiles]
        assert len(tiles) == 10
        assert max(sizes) - min(sizes) <= 1, (prio, sizes)
        assert sizes == sorted(sizes, reverse=True), (prio, sizes)


def test_basket_lift_components(spark):
    # pair support can never exceed either singleton support, and
    # lift components stay consistent: c12 <= min(c1, c2) via
    # lift_den >= c12 * c12 is NOT generally true — check directly
    # against recomputed singles
    rows = _SPECS["q_basket_lift"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs at this fixture
    from flink_streaming_example_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    singles = {
        r["event_type"]: r["c"]
        for r in ev.select(
            "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        assert r["t1"] < r["t2"]
        assert r["c12"] <= min(singles[r["t1"]], singles[r["t2"]])
        assert r["lift_den"] == singles[r["t1"]] * singles[r["t2"]]


def test_triangles_closed_form(spark, tmp_path):
    # K4 on parts {1,2,3,4} via one order + a disjoint edge {5,6}:
    # each K4 node sits in C(3,2)=3 triangles; 5 and 6 in none
    import pyarrow as pa
    import pyarrow.parquet as pq

    pairs = [(100, p) for p in (1, 2, 3, 4)] + [(200, 5), (200, 6)]
    n = len(pairs)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
                "l_partkey": pa.array([p for _, p in pairs], pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array(range(1, n + 1), pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array(
                    [datetime.datetime(2024, 1, 1)] * n, pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r["node"]: r["n_tri"]
        for r in _SPECS["q_triangles"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_twap_closed_form(spark, tmp_path):
    # value 10 held 1 s, then 20 held 3 s, final observation holds
    # nothing: num = (10e6*1e6 + 20e6*3e6) // 1e6 units×µs, den = 4e6 µs
    rows = [
        (1, 0, "2024-01-01T00:00:00", 10.0),
        (1, 1, "2024-01-01T00:00:01", 20.0),
        (1, 2, "2024-01-01T00:00:04", 99.0),
        (2, 3, "2024-01-01T00:00:00", 7.0),  # single obs -> no interval
    ]
    _write_events(rows, str(tmp_path))
    out = {
        r["user_id"]: (r["twap_num_unit_us"], r["twap_den_us"])
        for r in _SPECS["q_twap"].fn(spark, str(tmp_path)).collect()
    }
    num = (10_000_000 * 1_000_000 + 20_000_000 * 3_000_000) // 1_000_000
    assert out == {1: (num, 4_000_000)}


@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=0,
        max_size=60,
    )
)
def test_cusum_closed_form_fuzz(devs):
    """The window form S_t = P_t - min(P_0..P_t) must equal the Page
    recursion S_t = max(0, S_{t-1} + d_t) on any deviation sequence."""
    s_rec, p, mn = 0, 0, 0
    for d in devs:
        s_rec = max(0, s_rec + d)
        p += d
        mn = min(mn, p)
        assert s_rec == p - mn


def test_autocorr_definition(spark, duck, sf_dir):
    """Lag-1 autocorrelation components re-derived brute-force from
    the daily volume series, plus a sign sanity on the assembled
    coefficient (|corr| <= 1)."""
    import math

    got = {
        r["event_type"]: (
            r["n"], r["corr_num"], r["corr_den_x"], r["corr_den_y"]
        )
        for r in _SPECS["q_autocorr"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT event_type,"
        " epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,"
        " COUNT(*) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, _day, c in rows:
        series.setdefault(et, []).append(c)
    for et, xs in series.items():
        ps = list(zip(xs, xs[1:]))
        n = len(ps)
        sx = sum(x for x, _ in ps)
        sy = sum(y for _, y in ps)
        sxy = sum(x * y for x, y in ps)
        sxx = sum(x * x for x, _ in ps)
        syy = sum(y * y for _, y in ps)
        exp = (n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        assert got[et] == exp, et
        num, dx, dy = exp[1], exp[2], exp[3]
        if dx > 0 and dy > 0:
            assert abs(num / math.sqrt(dx * dy)) <= 1.0 + 1e-12
