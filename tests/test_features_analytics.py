"""Semantic unit tests for the feature-engineering (features.py) and
product-analytics (analytics.py) families — closed-form expectations
on crafted micro-frames plus invariants on the fixture output
(test_parity.py proves cross-engine equality; these prove the
operators compute the RIGHT thing)."""

from __future__ import annotations

import datetime
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from flink_streaming_example_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.01"

_SPECS = all_specs()


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_part(rows, out_dir):
    """rows: (p_partkey, p_name) with fixture physical schema."""
    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([r[1] for r in rows], pa.string()),
            "p_brand": pa.array(["Brand#1"] * len(rows), pa.string()),
            "p_type": pa.array(["STANDARD"] * len(rows), pa.string()),
            "p_size": pa.array([1] * len(rows), pa.int32()),
            "p_retailprice": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(table, f"{out_dir}/part.parquet")


def _write_customer(rows, out_dir):
    """rows: (c_custkey, c_nationkey, c_acctbal, c_mktsegment)."""
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"Customer#{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{out_dir}/customer.parquet")


def _write_orders(rows, out_dir):
    """rows: (o_orderkey, o_custkey, o_totalprice)."""
    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{out_dir}/orders.parquet")


def _write_events(rows, out_dir):
    """rows: (user_id, event_id, ts_iso, event_type)."""
    rows = sorted(rows, key=lambda r: r[1])
    table = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime.fromisoformat(r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{out_dir}/events.parquet")


# ---- features.py ----------------------------------------------------


def test_feature_hash_crafted(spark, tmp_path):
    # two parts, four tokens, one repeated -> brute-force bucket/sign
    _write_part([(1, "alpha beta"), (2, "alpha gamma")], str(tmp_path))
    got = {
        r["bucket"]: (r["n_tokens"], r["signed_sum"])
        for r in _SPECS["q_feature_hash"].fn(spark, str(tmp_path)).collect()
    }
    expected: dict[int, list[int]] = {}
    for tok in ["alpha", "beta", "alpha", "gamma"]:
        h = _h32(tok)
        b, s = h % 128, 1 if ((h >> 7) % 2 == 0) else -1
        expected.setdefault(b, [0, 0])
        expected[b][0] += 1
        expected[b][1] += s
    assert got == {b: tuple(v) for b, v in expected.items()}


def test_target_encode_crafted(spark, tmp_path):
    # segment A: 2 orders of 10.00; segment B: 1 order of 40.00
    # global mean = 60e6 // 3 = 20e6 micros
    # enc(A) = (20e6 + 20*20e6) // 22 = 420e6 // 22
    # enc(B) = (40e6 + 20*20e6) // 21 = 440e6 // 21
    _write_customer([(1, 0, 0.0, "A"), (2, 0, 0.0, "B")], str(tmp_path))
    _write_orders([(1, 1, 10.0), (2, 1, 10.0), (3, 2, 40.0)], str(tmp_path))
    got = {
        r["segment"]: (r["n_orders"], r["sum_micros"], r["enc_micros"])
        for r in _SPECS["q_target_encode"].fn(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (2, 20_000_000, (20_000_000 + 20 * 20_000_000) // 22)
    assert got["B"] == (1, 40_000_000, (40_000_000 + 20 * 20_000_000) // 21)


def test_minmax_scale_crafted(spark, tmp_path):
    # nation 0: balances 0 / 5 / 10 -> permille 0 / 500 / 1000;
    # nation 1: single customer -> degenerate range pins to 0;
    # nation 2: negative-to-positive range, exact midpoint
    _write_customer(
        [
            (1, 0, 0.0, "S"),
            (2, 0, 5.0, "S"),
            (3, 0, 10.0, "S"),
            (4, 1, 123.45, "S"),
            (5, 2, -10.0, "S"),
            (6, 2, 30.0, "S"),
            (7, 2, 10.0, "S"),
        ],
        str(tmp_path),
    )
    got = {
        r["c_custkey"]: r["permille"]
        for r in _SPECS["q_minmax_scale"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0, 2: 500, 3: 1000, 4: 0, 5: 0, 6: 1000, 7: 500}


def test_feature_hash_fixture_invariants(spark):
    rows = _SPECS["q_feature_hash"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < 128
        assert abs(r["signed_sum"]) <= r["n_tokens"]


def test_minmax_fixture_bounds(spark):
    rows = _SPECS["q_minmax_scale"].fn(spark, SF_DIR).collect()
    assert rows and all(0 <= r["permille"] <= 1000 for r in rows)


# ---- analytics.py ---------------------------------------------------


def test_retention_crafted(spark, tmp_path):
    # u1 first seen week W, active W and W+1; u2 first seen W+1 only
    _write_events(
        [
            (1, 0, "2024-01-01T00:00:00", "view"),
            (1, 1, "2024-01-09T00:00:00", "view"),
            (2, 2, "2024-01-10T00:00:00", "view"),
        ],
        str(tmp_path),
    )
    out = {
        (r["cohort_wk"], r["week_offset"]): r["n_users"]
        for r in _SPECS["q_retention_cohorts"].fn(spark, str(tmp_path)).collect()
    }
    wk = (
        int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        // (7 * 86_400 * 1_000_000)
    )
    # 2024-01-09/10 land in the next epoch week bucket
    assert out == {(wk, 0): 1, (wk, 1): 1, (wk + 1, 0): 1}


def test_funnel_crafted(spark, tmp_path):
    # u1 completes in order; u2 purchases BEFORE clicking (stops at
    # click); u3 never signs up (in no step at all)
    _write_events(
        [
            (1, 0, "2024-01-01T00:00:00", "signup"),
            (1, 1, "2024-01-01T01:00:00", "view"),
            (1, 2, "2024-01-01T02:00:00", "click"),
            (1, 3, "2024-01-01T03:00:00", "purchase"),
            (2, 4, "2024-01-01T00:00:00", "signup"),
            (2, 5, "2024-01-01T01:00:00", "view"),
            (2, 6, "2024-01-01T01:30:00", "purchase"),
            (2, 7, "2024-01-01T02:00:00", "click"),
            (3, 8, "2024-01-01T00:00:00", "view"),
            (3, 9, "2024-01-01T01:00:00", "purchase"),
        ],
        str(tmp_path),
    )
    out = {
        r["step"]: (r["step_order"], r["n_users"])
        for r in _SPECS["q_funnel_steps"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "signup": (1, 2),
        "view": (2, 2),
        "click": (3, 2),
        "purchase": (4, 1),
    }


def test_funnel_fixture_monotone(spark):
    rows = sorted(
        _SPECS["q_funnel_steps"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["step_order"],
    )
    counts = [r["n_users"] for r in rows]
    assert len(counts) == 4
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_running_distinct_crafted(spark, tmp_path):
    # day 0: u1, u2; day 1: u1 only; day 2: u3
    _write_events(
        [
            (1, 0, "2024-01-01T05:00:00", "view"),
            (2, 1, "2024-01-01T06:00:00", "view"),
            (1, 2, "2024-01-02T05:00:00", "view"),
            (3, 3, "2024-01-03T05:00:00", "view"),
        ],
        str(tmp_path),
    )
    out = sorted(
        (r["day"], r["n_active"], r["cum_distinct"])
        for r in _SPECS["q_running_distinct"].fn(spark, str(tmp_path)).collect()
    )
    d0 = (
        int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        // (86_400 * 1_000_000)
    )
    assert out == [(d0, 2, 2), (d0 + 1, 1, 2), (d0 + 2, 1, 3)]


def test_running_distinct_fixture_invariants(spark):
    rows = sorted(
        (r["day"], r["n_active"], r["cum_distinct"])
        for r in _SPECS["q_running_distinct"].fn(spark, SF_DIR).collect()
    )
    assert rows
    # cumulative distinct is non-decreasing and >= any day's actives;
    # the final value equals total distinct users
    cums = [c for _, _, c in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    assert all(a <= c for _, a, c in rows)
    from flink_streaming_example_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert cums[-1] == total


# ---- round-9 wave C: paths / pareto / rolling-active semantics ----


def test_session_paths_gap_boundary_and_cap(spark):
    """Exact-gap events stay in one session (rule is STRICTLY > gap);
    gap+1µs splits; the path joins at most 8 types in (tus, event_id)
    order with event_id breaking a timestamp tie."""
    from flink_streaming_example_spark.operators.analytics import (
        _SESSION_GAP_US,
        session_paths,
    )

    G = _SESSION_GAP_US
    rows = []
    # user 1: 12-event session, 1s apart -> path capped at 8
    rows += [(1, i, f"t{i}", 1_700_000_000_000_000 + i * 1_000_000)
             for i in range(12)]
    # user 2: exact-gap chain a->b (delta == G, same session), then
    # b ->(G+1) c (new session)
    base = 1_700_000_000_000_000
    rows += [(2, 100, "a", base), (2, 101, "b", base + G),
             (2, 102, "c", base + G + G + 1)]
    # user 3: two events at the SAME tus — event_id orders them
    rows += [(3, 201, "second", base), (3, 200, "first", base)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, tus long"
    )
    got = {
        r["path"]: (r["n_sessions"], r["n_users"])
        for r in session_paths(df).collect()
    }
    assert got[">".join(f"t{i}" for i in range(8))] == (1, 1)
    assert got["a>b"] == (1, 1)
    assert got["c"] == (1, 1)
    assert got["first>second"] == (1, 1)


def test_pareto_banding_matches_global_window(spark):
    """The banded prefix-sum must be bit-equal to the naive global
    running sum under adversarial band-boundary ties: revenues at
    2^20-1 / 2^20 / 2^20+1, duplicates across customers, and a seeded
    random multiset."""
    import random

    from flink_streaming_example_spark.operators.analytics import pareto_cum

    rng = random.Random(9)
    B = 1 << 20
    revs = [B - 1, B - 1, B, B, B + 1, 0, 1, 3 * B, 3 * B] + [
        rng.randrange(0, 5 * B) for _ in range(200)
    ]
    rows = [(i + 1, r) for i, r in enumerate(revs)]
    df = spark.createDataFrame(rows, "c_custkey long, rev_cents long")
    got = {
        r["c_custkey"]: (r["rev_cents"], r["cum_cents"], r["in_top80"])
        for r in pareto_cum(df).collect()
    }
    total = sum(revs)
    cum = 0
    for cust, rev in sorted(rows, key=lambda x: (-x[1], x[0])):
        cum += rev
        assert got[cust] == (rev, cum, int(cum * 5 <= total * 4)), cust


def test_rolling_active_identity_vs_brute_force(spark, duck, sf_dir):
    """The day-stamp-explode identity vs the direct definition: for
    every reported day, wau7 == COUNT(DISTINCT user) active in
    [day-6, day] — computed independently in DuckDB."""
    got = _SPECS["q_rolling_active_users"].fn(spark, sf_dir).toPandas()
    assert len(got) > 0
    brute = dict(
        duck.execute(
            """
            WITH d AS (SELECT DISTINCT user_id,
                         epoch_us(ts) // 86400000000 AS day FROM events),
            days AS (SELECT DISTINCT d1.day + g.i AS day
                     FROM d d1, range(0, 7) g(i)
                     WHERE d1.day + g.i <= (SELECT MAX(day) FROM d))
            SELECT days.day, COUNT(DISTINCT d.user_id)
            FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
            GROUP BY days.day
            """
        ).fetchall()
    )
    assert len(got) == len(brute)
    for _, r in got.iterrows():
        assert brute[r["day"]] == r["wau7"], r["day"]


def test_heavy_change_definition(spark, duck, sf_dir):
    """Top-30 by |second-half − first-half| activity, recomputed in
    plain Python (incl. the midpoint-day split rule and the tie
    order)."""
    got = _SPECS["q_heavy_change"].fn(spark, sf_dir).toPandas()
    rows = duck.execute(
        "SELECT user_id, epoch_us(ts) // 86400000000 FROM events"
    ).fetchall()
    days = [d for _, d in rows]
    mid = (min(days) + max(days) + 1) // 2
    per_user: dict[int, list[int]] = {}
    for u, d in rows:
        c = per_user.setdefault(u, [0, 0])
        c[0 if d < mid else 1] += 1
    ranked = sorted(
        ((u, a, b, abs(b - a)) for u, (a, b) in per_user.items()),
        key=lambda x: (-x[3], x[0]),
    )[:30]
    assert len(got) == 30
    for (_, r), exp in zip(got.iterrows(), ranked):
        # q_heavy_change returns an ordered frame; compare row-for-row
        assert (r["user_id"], r["cnt_a"], r["cnt_b"], r["abs_change"]) == exp


def test_time_to_convert_strictness(spark, duck, sf_dir):
    """Only users whose first purchase STRICTLY follows their first
    signup convert; p50 is the lower median of the exact µs deltas."""
    got = {
        r["cohort_wk"]: (r["n_converted"], r["p50_us"])
        for r in _SPECS["q_time_to_convert"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        """
        SELECT s.user_id, epoch_us(s.st), epoch_us(p.pt)
        FROM (SELECT user_id, MIN(ts) st FROM events
              WHERE event_type='signup' GROUP BY user_id) s
        JOIN (SELECT user_id, MIN(ts) pt FROM events
              WHERE event_type='purchase' GROUP BY user_id) p
          ON s.user_id = p.user_id
        """
    ).fetchall()
    per_wk: dict[int, list[tuple[int, int]]] = {}
    n_equal_or_before = 0
    for u, st, pt in rows:
        if pt <= st:
            n_equal_or_before += 1
            # a later purchase may still exist; recompute its true min
            later = duck.execute(
                "SELECT MIN(epoch_us(ts)) FROM events WHERE user_id = ?"
                " AND event_type = 'purchase' AND epoch_us(ts) > ?",
                [u, st],
            ).fetchone()[0]
            if later is None:
                continue
            pt = later
        per_wk.setdefault(st // 604800000000, []).append((pt - st, u))
    assert set(got) == set(per_wk)
    for wk, deltas in per_wk.items():
        deltas.sort()
        n = len(deltas)
        assert got[wk] == (n, deltas[(n + 1) // 2 - 1][0]), wk


def test_ab_experiment_accounting(spark, duck, sf_dir):
    """Variants partition the user set; converted/user counts and the
    micro-exact spend recompute independently."""
    import hashlib
    from decimal import Decimal

    got = {
        r["variant"]: (r["n_users"], r["n_converted"], r["total_value_micro"])
        for r in _SPECS["q_ab_experiment"].fn(spark, sf_dir).collect()
    }
    users = [u for (u,) in duck.execute(
        "SELECT DISTINCT user_id FROM events").fetchall()]
    purch = duck.execute(
        "SELECT user_id, value FROM events WHERE event_type='purchase'"
    ).fetchall()
    spend: dict[int, int] = {}
    for u, v in purch:
        spend[u] = spend.get(u, 0) + int(
            Decimal(repr(v)).scaleb(6).to_integral_value()
        )
    exp = {0: [0, 0, 0], 1: [0, 0, 0]}
    for u in users:
        var = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        exp[var][0] += 1
        if u in spend:
            exp[var][1] += 1
            exp[var][2] += spend[u]
    assert got == {k: tuple(v) for k, v in exp.items()}
    assert sum(v[0] for v in got.values()) == len(users)


def test_max_concurrency_definition(spark, duck, sf_dir):
    """Peak concurrency re-derived by literal interval stabbing:
    rebuild 6h-gap sessions per user in Python, sweep the +1/-1
    boundary multiset with ends-before-starts tie order, and check
    both the peak and its first timestamp."""
    row = _SPECS["q_max_concurrency"].fn(spark, sf_dir).collect()[0]
    rows = duck.execute(
        "SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) FROM events"
        " ORDER BY user_id, 2"
    ).fetchall()
    gap = 6 * 3_600 * 1_000_000
    bounds = []
    prev_user, s_us, last = None, None, None
    for uid, t in rows:
        if uid != prev_user or t - last > gap:
            if prev_user is not None:
                bounds.append((last + gap, -1))
                bounds.append((s_us, 1))
            prev_user, s_us = uid, t
        last = t
    bounds.append((last + gap, -1))
    bounds.append((s_us, 1))
    cur = peak = 0
    peak_ts = None
    for t, d in sorted(bounds):  # (-1 sorts before +1 at equal t)
        cur += d
        if cur > peak:
            peak, peak_ts = cur, t
    assert (row["peak"], row["peak_ts_us"]) == (peak, peak_ts)


def test_rfm_segments_definition(spark, duck, sf_dir):
    """RFM re-derived brute-force: python-side quartile scoring over
    the per-customer (recency, frequency, monetary) triples, plus the
    equal-frequency invariant (each score class holds n/4 +- 1
    customers per dimension)."""
    got = {
        r["segment"]: (r["n_customers"], r["total_cents"])
        for r in _SPECS["q_rfm_segments"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT o_custkey,"
        " datediff('day', CAST(MAX(o_orderdate) AS DATE),"
        "          DATE '1998-12-31'),"
        " COUNT(*),"
        " CAST(SUM(CAST(CAST(CAST(o_totalprice AS STRING)"
        "   AS DECIMAL(30,6)) * 100 AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY o_custkey"
    ).fetchall()
    n = len(rows)

    def scores(keyed):
        order = sorted(range(n), key=keyed)
        s = [0] * n
        for rank0, i in enumerate(order):
            s[i] = rank0 * 4 // n + 1
        return s

    r_s = scores(lambda i: (-rows[i][1], rows[i][0]))
    f_s = scores(lambda i: (rows[i][2], rows[i][0]))
    m_s = scores(lambda i: (rows[i][3], rows[i][0]))
    exp = {}
    for i in range(n):
        seg = f"{r_s[i]}{f_s[i]}{m_s[i]}"
        c, t = exp.get(seg, (0, 0))
        exp[seg] = (c + 1, t + rows[i][3])
    assert got == exp
    for s in (r_s, f_s, m_s):
        from collections import Counter

        sizes = Counter(s)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_ltv_cohorts_definition(spark, duck, sf_dir):
    """LTV curve re-derived brute-force: python cohorting by first-seen
    week, per-(cohort, age) revenue, running cumulation, cohort sizes."""
    got = {
        (r["cohort_week"], r["age_weeks"]): (
            r["n_users"], r["rev_micro"], r["cum_rev_micro"]
        )
        for r in _SPECS["q_ltv_cohorts"].fn(spark, sf_dir).collect()
    }
    week_us = 7 * 86_400_000_000
    rows = duck.execute(
        "SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)),"
        " event_type = 'purchase',"
        " CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000"
        "  AS BIGINT)"
        " FROM events ORDER BY user_id, 2"
    ).fetchall()
    first: dict[int, int] = {}
    for uid, tus, _p, _v in rows:
        w = tus // week_us
        if uid not in first or w < first[uid]:
            first[uid] = w
    size: dict[int, int] = {}
    for cw in first.values():
        size[cw] = size.get(cw, 0) + 1
    rev: dict[tuple[int, int], int] = {}
    for uid, tus, is_p, v in rows:
        key = (first[uid], tus // week_us - first[uid])
        rev[key] = rev.get(key, 0) + (v if is_p else 0)
    exp = {}
    for cw in {c for c, _ in rev}:
        cum = 0
        for age in sorted(a for c, a in rev if c == cw):
            cum += rev[(cw, age)]
            exp[(cw, age)] = (size[cw], rev[(cw, age)], cum)
    assert got == exp


def test_max_concurrency_boundary_tie_order(spark, tmp_path):
    """The sweep's ends-before-starts rule on an EXACT collision — a
    case the fixture can't produce (it needs a ts difference of
    exactly the 6h gap): user A's session end instant coincides with
    user B's session start, so the correct peak is 1; a
    starts-before-ends sweep would read 2.  A second pair overlaps
    for real to pin peak_ts on the genuine concurrency."""
    from tests.test_timeseries import _write_events

    rows = [
        # collision pair: A ends (last ts 01:00 + 6h = 07:00) exactly
        # as B starts at 07:00
        (1, 1, "2023-03-01T01:00:00", 1.0),
        (2, 2, "2023-03-01T07:00:00", 1.0),
        # genuine overlap pair much later: C [20:00, 02:00+6h) and
        # D [21:00, ...) -> concurrency 2 first reached at 21:00
        (3, 3, "2023-03-02T20:00:00", 1.0),
        (4, 4, "2023-03-02T21:00:00", 1.0),
    ]
    _write_events(rows, str(tmp_path))
    row = (
        _SPECS["q_max_concurrency"].fn(spark, str(tmp_path)).collect()[0]
    )
    import datetime as _dt

    want_ts = int(
        _dt.datetime(
            2023, 3, 2, 21, tzinfo=_dt.timezone.utc
        ).timestamp() * 1_000_000
    )
    assert (row["peak"], row["peak_ts_us"]) == (2, want_ts)
