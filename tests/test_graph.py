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
