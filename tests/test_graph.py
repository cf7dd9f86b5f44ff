"""Invariants of the fixed-point-integer PageRank beyond the oracle
hash (which pins the values): mass flows the right way in the
bipartite procurement graph and the fixed-point arithmetic never
produces sub-base ranks."""

from __future__ import annotations

from flink_streaming_example_spark.operators.graph import _BASE, _TOP
from flink_streaming_example_spark.plans.registry import all_specs


def test_pagerank_bipartite_flow_and_base_floor(spark, sf_dir):
    pdf = all_specs()["q_pagerank"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == _TOP
    # customers only DONATE in the bipartite graph (no in-edges), so
    # after one round they all sit at exactly _BASE and every top slot
    # belongs to a supplier node
    assert (pdf.node.str.startswith("s")).all(), pdf.node.tolist()
    # damping base is the rank floor; integer truncation may only
    # remove mass, never create it
    assert (pdf["rank"] >= _BASE).all()
    # ranking column is a contiguous 1..N permutation
    assert sorted(pdf.rn.tolist()) == list(range(1, _TOP + 1))


def test_docstring_constants_interpolated():
    # round-8 advisor: docstrings carried literal '{_CORE_TOP}' /
    # '{_MIX_CAP}' placeholders (plain strings, never interpolated)
    from flink_streaming_example_spark.operators import graph, pipeline

    assert "{_CORE_TOP}" not in graph.q_kcore.__doc__
    assert f"top-{graph._CORE_TOP}" in graph.q_kcore.__doc__
    d = pipeline.split_cap_pack_report.__doc__
    assert "{_MIX_CAP}" not in d and "{_MIX_BUDGET}" not in d
    assert str(pipeline._MIX_CAP) in d and str(pipeline._MIX_BUDGET) in d


def test_jaccard_neighbors_bruteforce(spark, duck, sf_dir):
    """Edge Jaccard re-derived with python set math over the same
    support-2 graph; the top-25 ordering (floored micro quotient,
    then pair) must match row-for-row."""
    got = [
        (r["p1"], r["p2"], r["common_nbrs"], r["union_nbrs"],
         r["jaccard_micro"])
        for r in all_specs()["q_jaccard_neighbors"].fn(spark, sf_dir).collect()
    ]
    edges = duck.execute(
        "WITH op AS (SELECT DISTINCT a.l_orderkey AS ok,"
        "  a.l_partkey AS p1, b.l_partkey AS p2"
        " FROM lineitem a JOIN lineitem b"
        "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"
        " SELECT p1, p2 FROM op GROUP BY 1, 2 HAVING COUNT(*) >= 2"
    ).fetchall()
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    for a, b in edges:
        cn = len(nbrs[a] & nbrs[b])
        un = len(nbrs[a] | nbrs[b])
        rows.append((a, b, cn, un, cn * 1_000_000 // un))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert got == rows[:25]


def test_lpa_tie_votes_partition_invariant(spark):
    """LPA's argmax must be deterministic under data layout even when
    every vote is a TIE: on a path graph each interior node sees
    exactly {left, right} labels at count 1 apiece, so the min-label
    tiebreak decides every round.  Two adversarially different
    physical layouts (round-robin vs hash-on-src repartitioning) must
    produce identical label tables — guards the max_by(struct(c,
    -label)) uniqueness argument (a plain max_by on count alone would
    be layout-dependent here)."""
    from pyspark.sql import functions as F

    from flink_streaming_example_spark.operators.graph import lpa_labels

    n = 2_000
    half = spark.range(n - 1).selectExpr("id AS p1", "id + 1 AS p2")
    und = half.selectExpr("p1 AS src", "p2 AS dst").unionByName(
        half.selectExpr("p2 AS src", "p1 AS dst")
    )
    a = lpa_labels(und.repartition(7), 3).toPandas()
    b = lpa_labels(und.repartition(13, "src"), 3).toPandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    # ties resolved to the smaller side: node 1's first-round vote
    # between labels 0 and 2 must pick 0
    assert int(a.loc[a["node"] == 1, "label"].iloc[0]) == 0
