"""cc_min_labels contract: fixpoint certification and the
non-convergence warning (a silent partial result would mis-cluster
high-diameter components — ADVICE round 2)."""

from __future__ import annotations

import warnings

import pytest

from flink_streaming_example_spark.operators.dedup import cc_min_labels


def _path_edges(spark, n):
    rows = [(i, i + 1) for i in range(n - 1)]
    return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")


def test_cc_converges_on_path(spark):
    n = 30
    labels = cc_min_labels(_path_edges(spark, n), max_iter=60).collect()
    assert len(labels) == n
    assert {r.cluster_id for r in labels} == {0}


def test_cc_warns_when_iteration_budget_too_small(spark):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cc_min_labels(_path_edges(spark, 30), max_iter=3).collect()
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "not converged" in str(w.message)
        for w in caught
    ), "partial propagation must not be silent"
