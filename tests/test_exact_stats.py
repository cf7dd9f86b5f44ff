"""Independent recomputation checks for the round-9 exact-statistics
keys (mode / MAD / Gini / inverted index / schema evolution) — the
operators' DEFINITIONS re-derived in plain Python over the same
fixture, so an oracle that merely mirrors a wrong formula can't
self-confirm (test_parity proves cross-engine equality; these prove
the statistic itself)."""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

from flink_streaming_example_spark.plans.registry import all_specs

_SPECS = all_specs()


def _lower_median(sorted_vals):
    n = len(sorted_vals)
    return sorted_vals[(n + 1) // 2 - 1]


def test_mode_per_key_definition(spark, duck, sf_dir):
    got = {
        r["event_type"]: (r["mode_user"], r["n_events"])
        for r in _SPECS["q_mode_per_key"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT event_type, user_id, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    per_type: dict[str, Counter] = {}
    for et, uid, n in rows:
        per_type.setdefault(et, Counter())[uid] = n
    assert set(got) == set(per_type)
    for et, counts in per_type.items():
        best_n = max(counts.values())
        best_user = min(u for u, n in counts.items() if n == best_n)
        assert got[et] == (best_user, best_n), et


def test_mad_definition(spark, duck, sf_dir):
    """med = lower median of micro-scaled values; mad = lower median
    of |v - med| — recomputed with Python ints from the raw doubles
    via the same shortest-repr decimal scaling."""
    got = {
        r["event_type"]: (r["med_micro"], r["mad_micro"], r["n_events"])
        for r in _SPECS["q_mad"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT event_type, value FROM events"
    ).fetchall()
    per_type: dict[str, list[int]] = {}
    for et, v in rows:
        vi = int(Decimal(repr(v)).scaleb(6).to_integral_value())
        per_type.setdefault(et, []).append(vi)
    assert set(got) == set(per_type)
    for et, vals in per_type.items():
        vals.sort()
        med = _lower_median(vals)
        mad = _lower_median(sorted(abs(v - med) for v in vals))
        assert got[et] == (med, mad, len(vals)), et


def test_gini_impurity_definition(spark, duck, sf_dir):
    got = {
        r["source"]: (r["n_docs"], r["n_langs"], r["gini_num"], r["gini_den"])
        for r in _SPECS["q_gini_impurity"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT source, lang, COUNT(*) FROM documents GROUP BY 1, 2"
    ).fetchall()
    per_src: dict[str, list[int]] = {}
    for src, _, n in rows:
        per_src.setdefault(src, []).append(n)
    assert set(got) == set(per_src)
    for src, counts in per_src.items():
        n = sum(counts)
        num = n * n - sum(c * c for c in counts)
        assert got[src] == (n, len(counts), num, n * n), src
        # impurity is a probability-scaled quantity: 0 <= num/den < 1
        assert 0 <= num < n * n


def test_inverted_index_postings(spark, duck, sf_dir):
    """df_docs is the true document frequency; postings are the 20
    SMALLEST doc_ids containing the token, ascending."""
    pdf = _SPECS["q_inverted_index"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    sample = pdf.sort_values("df_docs", ascending=False).head(5)
    for _, r in sample.iterrows():
        docs = [
            d
            for (d,) in duck.execute(
                """
                SELECT DISTINCT doc_id FROM (
                  SELECT doc_id,
                    unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents) WHERE tok = ? ORDER BY doc_id
                """,
                [r["token"]],
            ).fetchall()
        ]
        assert r["df_docs"] == len(docs) >= 3
        assert r["postings"] == ",".join(str(d) for d in docs[:20])


def test_schema_evolution_null_fill(spark, sf_dir):
    """The merged scan must NULL-fill `quality` for v1 files (count of
    non-null quality == odd-doc_id count) and keep every base row."""
    from pyspark.sql import functions as F

    from flink_streaming_example_spark.sources.tables import load_table
    from flink_streaming_example_spark.sources.text_formats import (
        documents_as_evolved_parquet,
    )

    path = documents_as_evolved_parquet(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    base = load_table(spark, sf_dir, "documents")
    n_total = base.count()
    n_odd = base.where(F.col("doc_id") % 2 == 1).count()
    assert merged.count() == n_total
    assert merged.where(F.col("quality").isNotNull()).count() == n_odd
    assert merged.where(
        (F.col("doc_id") % 2 == 0) & F.col("quality").isNotNull()
    ).count() == 0


def test_equi_depth_buckets(spark, duck, sf_dir):
    """Bucket populations differ by ≤1, cover all rows, and bucket
    ranges are disjoint and ordered; boundaries recomputed from the
    independently sorted cents list."""
    from decimal import Decimal

    got = (
        _SPECS["q_equi_depth_hist"].fn(spark, sf_dir).toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    vals = sorted(
        int(Decimal(repr(v)).scaleb(2).to_integral_value())
        for (v,) in duck.execute(
            "SELECT o_totalprice FROM orders").fetchall()
    )
    n = len(vals)
    assert got["n_rows"].sum() == n
    assert list(got["bucket"]) == list(range(8))
    sizes = list(got["n_rows"])
    assert max(sizes) - min(sizes) <= 1
    # recompute each bucket's span from the sorted multiset
    start = 0
    for _, r in got.iterrows():
        seg = vals[start:start + r["n_rows"]]
        assert r["lo_cents"] == seg[0] and r["hi_cents"] == seg[-1]
        start += r["n_rows"]
    # ranges never interleave
    for i in range(1, 8):
        assert got["lo_cents"][i] >= got["hi_cents"][i - 1]


def test_merge_into_actions(spark, duck, sf_dir):
    """MERGE branch accounting: inserts only for %10==3 source keys
    under +1_000_000; deletes exactly the matched negative-balance
    targets; keeps + updates + inserts partition the output."""
    got = _SPECS["q_merge_into"].fn(spark, sf_dir).toPandas()
    src = dict(
        duck.execute(
            """SELECT o_custkey, CAST(SUM(CAST(CAST(CAST(o_totalprice AS
               STRING) AS DECIMAL(30,6)) * 100 AS BIGINT)) AS BIGINT)
               FROM orders WHERE o_custkey % 3 <> 1
               GROUP BY o_custkey"""
        ).fetchall()
    )
    tgt = dict(
        duck.execute(
            """SELECT c_custkey, CAST(CAST(CAST(c_acctbal AS STRING)
               AS DECIMAL(30,6)) * 100 AS BIGINT) FROM customer"""
        ).fetchall()
    )
    by_action = {a: g for a, g in got.groupby("action")}
    ins = by_action["insert"]
    assert set(ins["c_custkey"]) == {
        k + 1000000 for k in src if k % 10 == 3
    }
    deleted = {k for k in tgt if k in src and tgt[k] < 0}
    assert deleted and deleted.isdisjoint(set(got["c_custkey"]))
    upd = by_action["update"]
    assert set(upd["c_custkey"]) == {
        k for k in tgt if k in src and tgt[k] >= 0
    }
    for _, r in upd.head(50).iterrows():
        assert r["bal_cents"] == tgt[r["c_custkey"]] + src[r["c_custkey"]]
    keep = by_action["keep"]
    assert set(keep["c_custkey"]) == {k for k in tgt if k not in src}
    assert len(got) == len(ins) + len(upd) + len(keep)


def test_skyline_dominance(spark, duck, sf_dir):
    """Skyline definition re-derived: no member dominates another on
    both dimensions, and every non-member is dominated by a member
    (price strictly higher implies day not newer)."""
    got = {
        (r["price_c"], r["day"])
        for r in _SPECS["q_skyline"].fn(spark, sf_dir).collect()
    }
    pts = duck.execute(
        """SELECT CAST(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6))
           * 100 AS BIGINT),
           epoch_us(o_orderdate) // 86400000000
           FROM orders"""
    ).fetchall()
    # collapse to per-price max-day, then brute-force sweep
    best: dict[int, int] = {}
    for p, d in pts:
        best[p] = max(best.get(p, -1), d)
    items = sorted(best.items(), key=lambda x: -x[0])
    sky, run = set(), -1
    for p, d in items:
        if d > run:
            sky.add((p, d))
        run = max(run, d)
    assert got == sky
    # mutual non-dominance inside the skyline
    s = sorted(got, key=lambda x: -x[0])
    for (p1, d1), (p2, d2) in zip(s, s[1:]):
        assert p1 > p2 and d2 > d1


def test_multiset_ops_counts(spark, duck, sf_dir):
    """exceptAll/intersectAll multiplicities re-derived from raw
    per-side Counters: max(m-n, 0) and min(m, n)."""
    from collections import Counter

    got = {
        r["custkey"]: (r["n_except_all"], r["n_intersect_all"])
        for r in _SPECS["q_multiset_ops"].fn(spark, sf_dir).collect()
    }
    a = Counter(
        k
        for (k,) in duck.execute(
            "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
        ).fetchall()
    )
    b = Counter(
        k
        for (k,) in duck.execute(
            "SELECT o_custkey FROM orders WHERE o_totalprice > 150000"
        ).fetchall()
    )
    exp = {}
    for k in set(a) | set(b):
        ex, inter = max(a[k] - b[k], 0), min(a[k], b[k])
        if ex or inter:
            exp[k] = (ex, inter)
    assert got == exp


def test_k_anonymity_definition(spark, duck, sf_dir):
    """k-anonymity audit re-derived brute-force over the equivalence
    classes, plus the release/suppress partition invariant."""
    from collections import Counter

    got = {
        (r["lang"], r["source"]): (
            r["n_classes"], r["n_violating"], r["n_suppressed"],
            r["n_released"], r["min_class_size"],
        )
        for r in _SPECS["q_k_anonymity"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT lang, source, n_chars // 200 FROM documents"
    ).fetchall()
    classes = Counter(rows)
    exp = {}
    for (lang, src, _band), n in classes.items():
        c = exp.setdefault((lang, src), [0, 0, 0, 0, None])
        c[0] += 1
        if n < 5:
            c[1] += 1
            c[2] += n
        else:
            c[3] += n
        c[4] = n if c[4] is None else min(c[4], n)
    assert got == {k: tuple(v) for k, v in exp.items()}
    total = duck.execute(
        "SELECT COUNT(*) FROM documents"
    ).fetchone()[0]
    assert sum(v[2] + v[3] for v in got.values()) == total


def test_snapshot_diff_definition(spark, duck, sf_dir):
    """Snapshot diff re-derived brute-force from the two synthesized
    states; every change class must be non-empty (the synthesis rule
    guarantees it, and an empty class would mean the classifier is
    dead code)."""
    got = {
        r["change"]: (r["n_rows"], r["abs_cent_delta"], r["cents_checksum"])
        for r in _SPECS["q_snapshot_diff"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {"added", "removed", "changed", "unchanged"}
    rows = duck.execute(
        "SELECT o_orderkey, epoch_us(o_orderdate),"
        " CAST(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6)) * 100"
        "  AS BIGINT) FROM orders"
    ).fetchall()
    import datetime

    cut_a = int(
        datetime.datetime(1997, 1, 1, tzinfo=datetime.timezone.utc)
        .timestamp() * 1_000_000
    )
    cut_b = int(
        datetime.datetime(1998, 1, 1, tzinfo=datetime.timezone.utc)
        .timestamp() * 1_000_000
    )
    a = {k: c for k, t, c in rows if t < cut_a}
    b = {
        k: c + (500 if k % 7 == 0 else 0)
        for k, t, c in rows
        if t < cut_b and k % 97 != 0
    }
    exp: dict[str, list[int]] = {}
    for k in set(a) | set(b):
        if k not in a:
            cls, delta, chk = "added", 0, b[k]
        elif k not in b:
            cls, delta, chk = "removed", 0, a[k]
        elif a[k] != b[k]:
            cls, delta, chk = "changed", abs(b[k] - a[k]), b[k]
        else:
            cls, delta, chk = "unchanged", 0, b[k]
        c = exp.setdefault(cls, [0, 0, 0])
        c[0] += 1
        c[1] += delta
        c[2] += chk
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_bpe_tokenize_equals_true_greedy_bpe(spark, duck, sf_dir):
    """The replace-chain implementation must equal an honest
    symbol-list BPE apply: for each merge in priority order, greedily
    merge all left-to-right non-overlapping occurrences to a fixed
    point (one replace pass only closes alternating repeats — the
    3-pass argument in _bpe_sql — so the reference here iterates to
    convergence)."""
    from flink_streaming_example_spark.operators.text_analysis import (
        _BPE_PREFIX,
        BPE_MERGES,
    )

    got = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["total_chars"], r["total_bpe_tokens"]
        )
        for r in _SPECS["q_bpe_tokenize"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        f"SELECT lang, source, substring(text, 1, {_BPE_PREFIX})"
        " FROM documents"
    ).fetchall()

    def bpe_count(text: str) -> int:
        syms = list(text)
        for a, b in BPE_MERGES:
            while True:
                out, i, merged = [], 0, False
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                        merged = True
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                if not merged:
                    break
        return len(syms)

    exp: dict[tuple[str, str], list[int]] = {}
    for lang, src, p in rows:
        c = exp.setdefault((lang, src), [0, 0, 0])
        c[0] += 1
        c[1] += len(p)
        c[2] += bpe_count(p)
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_class_balance_definition(spark, duck, sf_dir):
    """Balance property + selection re-derived: every class keeps
    exactly min-class-size docs, and the kept set is the bottom-k of
    the md5 order."""
    import hashlib as _h

    got = {
        r["lang"]: (r["n_kept"], r["id_checksum"], r["kept_chars"])
        for r in _SPECS["q_class_balance"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT lang, doc_id, n_chars FROM documents"
    ).fetchall()
    by_lang: dict[str, list] = {}
    for lang, did, nc in rows:
        by_lang.setdefault(lang, []).append((did, nc))
    k = min(len(v) for v in by_lang.values())
    exp = {}
    for lang, docs in by_lang.items():
        docs.sort(key=lambda d: (_h.md5(str(d[0]).encode()).hexdigest(), d[0]))
        kept = docs[:k]
        exp[lang] = (k, sum(d for d, _ in kept), sum(c for _, c in kept))
    assert got == exp
    assert len({v[0] for v in got.values()}) == 1


def test_profile_columns_counts_nulls_and_distincts(spark):
    """The parity fixture carries ZERO nulls, so q_data_profile's
    null-count path needs a crafted frame: NULLs must be counted per
    column AND excluded from the distinct cardinality (SQL COUNT
    DISTINCT semantics on both engines)."""
    from flink_streaming_example_spark.operators.relational import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, None, None),
            (2, "a", 5.0),
            (None, "b", 5.0),
        ],
        "k long, s string, v double",
    )
    got = {
        r["column_name"]: (r["n_nulls"], r["n_distinct"])
        for r in profile_columns(df, ("k", "s", "v")).collect()
    }
    assert got == {"k": (1, 2), "s": (1, 2), "v": (2, 1)}


def test_seasonality_weekday_arithmetic_pins_sunday_zero(spark):
    """(epoch_days + 4) % 7 must map Sunday->0 .. Saturday->6 — the
    portable weekday q_seasonality relies on instead of dayofweek()
    (Spark is 1-based Sunday, DuckDB 0-based).  2024-01-07 was a
    Sunday; the week from there must enumerate 0..6."""
    rows = spark.sql(
        """
        SELECT d,
          (unix_micros(CAST(d AS TIMESTAMP)) div 86400000000 + 4) % 7
            AS wd
        FROM (
          SELECT explode(sequence(DATE'2024-01-07', DATE'2024-01-13'))
            AS d
        )
        ORDER BY d
        """
    ).collect()
    assert [r["wd"] for r in rows] == [0, 1, 2, 3, 4, 5, 6]
