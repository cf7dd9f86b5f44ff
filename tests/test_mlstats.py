"""Independent recomputation checks for the mlstats family (OLS
trend / chi-squared selection / Mann-Whitney AUC / decile lift) —
each statistic's DEFINITION re-derived in plain Python (or closed
numpy form) over the same fixture, so an oracle that mirrors a wrong
formula can't self-confirm.  A hypothesis fuzz hammers the AUC
prefix-sum identity against the O(n²) pairwise definition."""

from __future__ import annotations

from collections import Counter
from decimal import Decimal
from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_streaming_example_spark.plans.registry import all_specs

_SPECS = all_specs()

_DAY_US = 86_400_000_000


def _cents(v: float) -> int:
    return int(Decimal(str(v)) * 100)


def test_ols_trend_definition(spark, duck, sf_dir):
    """slope_num/den must equal the least-squares slope of cents-vs-
    day — re-derived via exact Fraction arithmetic from raw rows, and
    cross-checked (loosely) against numpy lstsq."""
    got = {
        r["event_type"]: (r["n"], r["slope_num"], r["icept_num"], r["den"])
        for r in _SPECS["q_ols_trend"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        f"SELECT event_type, epoch_us(ts) // {_DAY_US}, value FROM events"
    ).fetchall()
    per: dict[str, list[tuple[int, int]]] = {}
    for et, day, v in rows:
        per.setdefault(et, []).append((int(day), _cents(v)))
    assert set(got) == set(per)
    for et, pts in per.items():
        d0 = min(d for d, _ in pts)
        xs = [d - d0 for d, _ in pts]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        assert got[et] == (n, n * sxy - sx * sy, sy * sxx - sx * sxy,
                           n * sxx - sx * sx), et
        # the emitted fraction IS the least-squares slope
        num, _, den = got[et][1], got[et][2], got[et][3]
        slope = np.polyfit(np.array(xs, dtype=float),
                           np.array(ys, dtype=float), 1)[0]
        assert abs(Fraction(num, den) - slope) < 1e-4, et


def test_chi2_select_definition(spark, duck, sf_dir):
    """chi2_e6 re-derived from scratch: doc-distinct token counts →
    2×2 table → floor(10^6 · N(ad-bc)²/((a+b)(c+d)(a+c)(b+d))), and
    the emitted rows are exactly the per-lang top-15 by (chi2, token)
    among tokens with 5 ≤ df < N."""
    got = [
        (r["lang"], r["token"], r["df_lang"], r["chi2_e6"])
        for r in _SPECS["q_chi2_select"].fn(spark, sf_dir).collect()
    ]
    docs = duck.execute("SELECT lang, lower(text) FROM documents").fetchall()
    n_docs = len(docs)
    n_lang: Counter = Counter(lang for lang, _ in docs)
    df_lang: Counter = Counter()
    df_tot: Counter = Counter()
    for lang, text in docs:
        toks = {t for t in text.split(" ") if t}
        for t in toks:
            df_lang[(lang, t)] += 1
            df_tot[t] += 1
    per_lang: dict[str, list] = {}
    for (lang, t), a in df_lang.items():
        tt = df_tot[t]
        if not (5 <= tt < n_docs):
            continue
        nl = n_lang[lang]
        b, c = tt - a, nl - a
        d = n_docs - nl - b
        dif = a * d - b * c
        chi2_e6 = (n_docs * dif * dif * 10**6) // (
            tt * (n_docs - tt) * nl * (n_docs - nl)
        )
        per_lang.setdefault(lang, []).append((-chi2_e6, t, a))
    want = []
    for lang, items in per_lang.items():
        for neg, t, a in sorted(items)[:15]:
            want.append((lang, t, a, -neg))
    assert sorted(got) == sorted(want)


def _u2_bruteforce(scores, labels):
    """2·U by the O(n²) pairwise definition: 2 per strictly-greater
    positive-negative pair, 1 per tie."""
    pos = [s for s, l in zip(scores, labels) if l]
    neg = [s for s, l in zip(scores, labels) if not l]
    u2 = 0
    for p in pos:
        for q in neg:
            u2 += 2 if p > q else (1 if p == q else 0)
    return u2, 2 * len(pos) * len(neg)


def _u2_prefix(scores, labels):
    """2·U by the operator's per-score prefix identity."""
    per: dict[int, list[int]] = {}
    for s, l in zip(scores, labels):
        g = per.setdefault(s, [0, 0])
        g[0 if l else 1] += 1
    u2, cum_neg = 0, 0
    for s in sorted(per):
        p, q = per[s]
        u2 += p * (2 * cum_neg + q)
        cum_neg += q
    return u2


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.booleans()),
        min_size=0,
        max_size=40,
    )
)
def test_auc_identity_fuzz(pairs):
    scores = [s for s, _ in pairs]
    labels = [l for _, l in pairs]
    brute, _ = _u2_bruteforce(scores, labels)
    assert _u2_prefix(scores, labels) == brute


def test_auc_definition(spark, duck, sf_dir):
    row = _SPECS["q_auc"].fn(spark, sf_dir).collect()[0]
    rows = duck.execute(
        "SELECT value, event_type = 'purchase' FROM events"
    ).fetchall()
    scores = [int(Decimal(str(v)) * 10**6) for v, _ in rows]
    labels = [bool(l) for _, l in rows]
    n_pos = sum(labels)
    assert row["auc_den"] == 2 * n_pos * (len(rows) - n_pos)
    assert row["auc_num"] == _u2_prefix(scores, labels)
    # AUC of a score uncorrelated with the label hovers near 1/2
    assert 0.3 < row["auc_num"] / row["auc_den"] < 0.7


def test_decile_lift_definition(spark, duck, sf_dir):
    got = {
        r["decile"]: (r["n_users"], r["n_conv"])
        for r in _SPECS["q_decile_lift"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        """SELECT user_id, value, event_type = 'purchase'
           FROM events"""
    ).fetchall()
    per: dict[int, list] = {}
    for uid, v, conv in rows:
        g = per.setdefault(uid, [0, 0])
        g[0] += _cents(v) * 10_000  # micro scaling as in the operator
        g[1] = max(g[1], int(conv))
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(ranked)
    want: dict[int, list] = {}
    for rnk0, (_, (_, conv)) in enumerate(ranked):
        dec = rnk0 * 10 // n + 1
        g = want.setdefault(dec, [0, 0])
        g[0] += 1
        g[1] += conv
    assert got == {d: tuple(v) for d, v in want.items()}
    assert sum(v[0] for v in got.values()) == n
    # equal-frequency: bucket sizes differ by at most 1
    sizes = [v[0] for v in got.values()]
    assert max(sizes) - min(sizes) <= 1


def test_ks_definition(spark, duck, sf_dir):
    """KS re-derived by literal CDF sweep: sort each sample, walk the
    merged distinct scores, track |c1*n2 - c2*n1| and its first
    argmax."""
    row = _SPECS["q_ks_test"].fn(spark, sf_dir).collect()[0]
    rows = duck.execute(
        "SELECT value, event_type = 'purchase' FROM events"
    ).fetchall()
    pos = sorted(int(Decimal(str(v)) * 10**6) for v, l in rows if l)
    neg = sorted(int(Decimal(str(v)) * 10**6) for v, l in rows if not l)
    n1, n2 = len(pos), len(neg)
    assert (row["n_pos"], row["n_neg"]) == (n1, n2)
    import bisect

    best, arg = -1, None
    for s in sorted(set(pos) | set(neg)):
        c1 = bisect.bisect_right(pos, s)
        c2 = bisect.bisect_right(neg, s)
        diff = abs(c1 * n2 - c2 * n1)
        if diff > best:
            best, arg = diff, s
    assert (row["ks_num"], row["arg_score"]) == (best, arg)
    # sanity: 0 <= KS <= 1 strictly inside for overlapping samples
    assert 0 < row["ks_num"] < n1 * n2
