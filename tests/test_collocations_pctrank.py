"""Semantic tests for q_collocations (exact integer PMI-lift ranking)
and q_percent_rank (integer rank-ratio parts) on crafted fixtures —
oracle parity proves cross-engine equality; these prove the formulas
and tie semantics."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from flink_streaming_example_spark.plans.registry import all_specs

_SPECS = all_specs()


def _write_documents(texts, out_dir):
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["crafted"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, f"{out_dir}/documents.parquet")


def _write_customer(rows, out_dir):
    """rows: (c_custkey, c_mktsegment, c_acctbal)."""
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"Customer#{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{out_dir}/customer.parquet")


def test_collocations_crafted(spark, tmp_path):
    # "x y" always adjacent (6 docs) -> passes support, maximal lift;
    # the filler tokens never repeat a pair 5 times
    texts = ["x y"] * 6 + [f"f{i} g{i} h{i}" for i in range(10)]
    _write_documents(texts, str(tmp_path))
    out = sorted(
        _SPECS["q_collocations"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["rn"],
    )
    assert out and (out[0]["w1"], out[0]["w2"]) == ("x", "y")
    # brute-force the exact ppm score: N tokens, NB bigrams, n_x=n_y=6
    n_tokens = 6 * 2 + 10 * 3
    n_bigrams = 6 * 1 + 10 * 2
    want = (6 * n_tokens * n_tokens * 1_000_000) // (n_bigrams * 6 * 6)
    assert out[0]["n_xy"] == 6 and out[0]["score_ppm"] == want
    # only (x, y) reaches the support threshold in this corpus
    assert len(out) == 1


def test_percent_rank_tie_semantics(spark, tmp_path):
    # balances [5, 5, 10]: tied pair shares rank 1 and cume_n 2 (RANGE
    # frame counts peers together); the third row closes the CDF
    _write_customer(
        [(1, "S", 5.0), (2, "S", 5.0), (3, "S", 10.0), (4, "T", 7.0)],
        str(tmp_path),
    )
    got = {
        r["c_custkey"]: (r["segment"], r["rnk"], r["cume_n"], r["n_seg"])
        for r in _SPECS["q_percent_rank"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: ("S", 1, 2, 3),
        2: ("S", 1, 2, 3),
        3: ("S", 3, 3, 3),
        4: ("T", 1, 1, 1),
    }
