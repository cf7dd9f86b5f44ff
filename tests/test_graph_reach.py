"""Semantic tests for the reachability graph keys (connected
components + bounded BFS) on crafted co-purchase graphs — the oracle
parity run proves cross-engine equality; these prove the component
and hop semantics on graphs with KNOWN structure, including the
support threshold's edge-dropping behavior."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from flink_streaming_example_spark.plans.registry import all_specs

_SPECS = all_specs()


def _write_lineitem(order_parts, out_dir):
    """order_parts: list of (orderkey, [partkeys]) -> lineitem.parquet
    with the fixture's exact physical schema."""
    rows = [
        (ok, pk, i)
        for ok, parts in order_parts
        for i, pk in enumerate(parts, start=1)
    ]
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(table, f"{out_dir}/lineitem.parquet")


def test_connected_components_crafted(spark, tmp_path):
    # {1,2,3} chained by support-2 pairs; {10,11} support-2; the
    # bridge (3,10) occurs only ONCE -> dropped by the threshold, so
    # the components stay separate
    _write_lineitem(
        [
            (1, [1, 2]),
            (2, [1, 2]),
            (3, [2, 3]),
            (4, [2, 3]),
            (5, [10, 11]),
            (6, [10, 11]),
            (7, [3, 10]),  # support 1 — must NOT merge the components
        ],
        str(tmp_path),
    )
    out = {
        r["component"]: r["n_nodes"]
        for r in _SPECS["q_connected_components"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: 3, 10: 2}


def test_bfs_hops_crafted(spark, tmp_path):
    # path 0-1-2-...-8 (support 2 each); seed = 0 (id % 100 == 0).
    # hops 0..6 reach nodes 0..6; nodes 7 and 8 lie beyond the bound.
    # second component 100-101 seeds itself at 100.
    orders = []
    ok = 1
    for a, b in zip(range(0, 8), range(1, 9)):
        for _ in range(2):
            orders.append((ok, [a, b]))
            ok += 1
    for _ in range(2):
        orders.append((ok, [100, 101]))
        ok += 1
    _write_lineitem(orders, str(tmp_path))
    out = {
        r["hop"]: r["n_nodes"]
        for r in _SPECS["q_bfs_hops"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: 2, 1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}


def test_cc_sizes_cover_thresholded_nodes(spark):
    # fixture invariant: component sizes sum to the number of distinct
    # nodes in the thresholded edge set (every edge-touching node is
    # labeled exactly once)
    from flink_streaming_example_spark.operators.graph import (
        _SUPPORT,
        copurchase_half_edges,
    )
    from flink_streaming_example_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    e = copurchase_half_edges(li, min_support=_SUPPORT)
    n_nodes = (
        e.select(F.col("p1").alias("n"))
        .unionByName(e.select(F.col("p2").alias("n")))
        .distinct()
        .count()
    )
    comp = _SPECS["q_connected_components"].fn(spark, sf).collect()
    assert sum(r["n_nodes"] for r in comp) == n_nodes
    assert len(comp) > 1  # the threshold actually fragments the graph
