"""Tests for the round-9 scale-join patterns: the Bloom prefilter must
actually PRUNE (the whole point of the pattern), the salted join must
be bit-equal to the plain join it rewrites, and the partitioned source
must prune partitions in the executed plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import all_specs
from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"

_SPECS = all_specs()


def test_bloom_prefilter_actually_prunes(spark):
    from flink_streaming_example_spark.operators.joins import (
        _BLOOM_BAL,
        bloom_positions,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    supp = load_table(spark, SF_DIR, "supplier").where(
        F.col("s_acctbal") > _BLOOM_BAL
    )
    bits = (
        supp.select(
            F.explode(F.array(*bloom_positions("s_suppkey"))).alias("bit")
        )
        .distinct()
        .agg(F.sort_array(F.collect_set("bit")).alias("bloom"))
    )
    probes = bloom_positions("l_suppkey")
    n_total = li.count()
    n_candidates = (
        li.join(F.broadcast(bits), how="cross")
        .where(
            F.array_contains("bloom", probes[0])
            & F.array_contains("bloom", probes[1])
            & F.array_contains("bloom", probes[2])
        )
        .count()
    )
    n_exact = li.join(
        F.broadcast(supp.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    ).count()
    # no false negatives (candidates superset of exact) AND the
    # prefilter prunes a real fraction of the fact table
    assert n_exact <= n_candidates < n_total
    assert n_candidates < n_total * 0.5, (
        f"bloom pruned only {n_total - n_candidates} of {n_total} rows"
    )


def test_salted_join_equals_plain_join(spark):
    salted = {
        (r["p_brand"], r["n_items"], r["sum_price"])
        for r in _SPECS["q_skew_salted_join"].fn(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    from flink_streaming_example_spark.functions.stable import stable_sum

    plain = {
        (r["p_brand"], r["n_items"], r["sum_price"])
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            stable_sum("l_extendedprice", "sum_price"),
        )
        .collect()
    }
    assert salted == plain


def test_partitioned_source_prunes_partitions(spark):
    df = _SPECS["q_partitioned_source"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("event_type" in f and "purchase" in f for f in filters), (
        f"no event_type partition filter in {filters}"
    )
    # and the row-group data filter list must NOT need event_type —
    # the layout satisfied it
    assert df.count() > 0


def test_bucketed_join_elides_fact_exchanges(spark):
    """The whole point of q_bucketed_join: both fact scans are bucketed
    (Bucketed: true, all buckets selected) and feed the SortMergeJoin
    directly — the ONLY Exchange node in the plan is the final
    per-priority aggregate."""
    import re

    df = _SPECS["q_bucketed_join"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, "both scans must be bucketed"
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, (
        f"expected only the aggregate exchange, got {len(exchanges)}"
    )
    # and the result itself is non-trivial
    assert df.count() > 0
