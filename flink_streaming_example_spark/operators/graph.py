"""Iterative graph analytics on DataFrames: fixed-point-integer
PageRank (SURVEY.md §2.9 mandate — the iterative-algorithm class,
next to the connected-components substrate in dedup.py).

PageRank is the canonical "loop over a join+aggregate" workload: each
iteration is contribution = rank/out_degree shipped along edges, then
a per-destination sum — exactly a shuffle-by-dst aggregation Spark
already executes with map-side partial sums.  The loop UNROLLS into
the logical plan (a Python `for` builds three stacked join+agg
layers; nothing iterates driver-side over data), which is the right
shape for a fixed small iteration count; beyond ~10 rounds the plan
lineage gets localCheckpoint truncation like the connected-components
loop (dedup.py).

Determinism across engines is the interesting part: float PageRank is
order-sensitive (a tree-reduced double sum differs from a sequential
one), so ranks here are FIXED-POINT INTEGERS — initial mass 10^12 per
node, contributions divided with integer division, damping 0.85
applied as (85 * x) div 100.  Every operation is exact 64-bit integer
arithmetic, so Spark and DuckDB agree bit-for-bit and the oracle can
unroll the identical three rounds in SQL.  (Truncation loses at most
1 unit of 10^-12 mass per edge per round — irrelevant at ranking
granularity; headroom: 85 * total_mass must stay under 2^63, so at
10^7+ nodes drop SCALE to 10^9.)

Graph: the customer -> supplier procurement network (distinct
(o_custkey, l_suppkey) pairs via orders x lineitem) — bipartite, so
rank flows customers -> suppliers and dangling supplier nodes keep
base rank only (the simplified dangling-mass variant, documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_SCALE = 10**12
_BASE = 15 * _SCALE // 100  # (1 - d) * mass, d = 0.85
_ROUNDS = 3
_TOP = 20


def _oracle() -> str:
    prev = "r0"
    rounds = []
    for k in range(1, _ROUNDS + 1):
        # CASTs pin BIGINT: DuckDB's SUM over BIGINT widens to HUGEINT
        # (int128), which pandas would surface as float64 and break the
        # integer-exactness contract at the compare layer.
        rounds.append(
            f"""r{k} AS (
  SELECT n.node,
         CAST({_BASE} + (85 * COALESCE(c.contrib, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(r.rank // e.out_deg) AS BIGINT) AS contrib
    FROM edges e JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)"""
        )
        prev = f"r{k}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges_raw AS (
  SELECT 'c' || CAST(ck AS VARCHAR) AS src,
         's' || CAST(sk AS VARCHAR) AS dst
  FROM pairs
), nodes AS (
  SELECT src AS node FROM edges_raw
  UNION
  SELECT dst FROM edges_raw
), edges AS (
  SELECT e.src, e.dst, d.out_deg
  FROM edges_raw e JOIN (
    SELECT src, COUNT(*) AS out_deg FROM edges_raw GROUP BY src
  ) d USING (src)
), r0 AS (
  SELECT node, CAST({_SCALE} AS BIGINT) AS rank FROM nodes
), {", ".join(rounds)}
SELECT node, rank, CAST(rn AS INTEGER) AS rn FROM (
  SELECT node, rank,
         ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rn
  FROM {prev}
) WHERE rn <= {_TOP}
"""


@register("q_pagerank", oracle=_oracle(), tags=("graph",))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled rounds of fixed-point-integer PageRank (module
    docstring) over the customer->supplier procurement graph; output
    is the top-20 nodes by rank with a deterministic (rank desc, node)
    order.  Per round: one join shipping rank div out_deg along edges
    + one shuffle-by-dst integer sum + one left join back onto the
    node set — all exact 64-bit arithmetic, bit-equal to the oracle's
    identical unroll."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # Materialize the edge list FIRST, then derive everything from the
    # checkpoint: edges, nodes and all three unrolled rounds reference
    # it, and without lineage truncation each reference re-runs the
    # orders x lineitem distinct — the dominant cost (profiled at
    # sf0.1: the pair derivation is ~7x the per-round join+sum).  Same
    # localCheckpoint idiom as the connected-components loop
    # (dedup.py); at cluster scale this is the persisted edge list
    # every PageRank implementation starts from.
    edges_raw = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).localCheckpoint(eager=True)
    nodes = (
        edges_raw.select(F.col("src").alias("node"))
        .union(edges_raw.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_deg = edges_raw.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges = edges_raw.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(_SCALE).cast("long"))
    # Broadcast hints: ranks and contrib are NODE-sized (dimension
    # scale — customers + suppliers), edges are FACT-sized; per round
    # the only shuffle left is the groupBy-dst partial sum.  On a
    # graph whose node set outgrows broadcast, drop the hints and
    # pre-partition edges by src so the shuffle joins co-locate.
    for _ in range(_ROUNDS):
        contrib = (
            edges.join(
                F.broadcast(
                    ranks.select(F.col("node").alias("src"), "rank")
                ),
                "src",
            )
            .select("dst", F.expr("rank div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes.node == contrib.dst, "left"
        ).select(
            "node",
            F.expr(
                f"CAST({_BASE} + (85 * coalesce(contrib, 0)) div 100 "
                "AS BIGINT)"
            ).alias("rank"),
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return (
        ranks.select("node", "rank", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _TOP)
    )
