"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning at 100 TB (SURVEY.md §2.9 mandate, beyond the
reference surface).

Partition pruning and parquet min/max skipping only help when rows
that are close in QUERY space are close in FILE space.  Sorting by one
column clusters that column and scatters every other; interleaving the
bits of several columns (the Morton / Z-value, the technique behind
Delta Lake's `OPTIMIZE ZORDER BY` and the classic UB-tree layout)
gives every interleaved column locality at once: any fixed prefix of
the Z-value confines EVERY dimension to a power-of-two range, so
per-file min/max statistics stay tight on all of them.

The operator computes a 16-bit Z-value from two 8-bit dimensions with
pure integer expressions (shift/and/multiply — whole-stage-codegen
JVM arithmetic, no UDF), then buckets rows by the Z-value's top 4 bits
— the file-assignment rule a writer would use.  At scale the same
expression feeds `repartitionByRange(z)` + sortWithinPartitions(z) to
physically lay the files out; here the per-bucket min/max envelope of
BOTH dimensions is the output, which is also the proof of the
property (each of the 16 buckets confines x AND y to a 64-wide range
— a plain sort by x would leave y's envelope at full width).

The whole computation is deterministic integer arithmetic, so the
DuckDB oracle mirrors it term for term and the layout rule is
hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_BITS = 8  # per-dimension width -> 16-bit Z-value
_BUCKET_SHIFT = 12  # keep the top 4 Z bits -> 16 buckets (4x4 grid)


def _zvalue(x: Column, y: Column) -> Column:
    """Interleave the low 8 bits of x (even positions) and y (odd
    positions) into a 16-bit Morton code, as a single codegen-friendly
    integer expression."""
    terms = []
    for i in range(_BITS):
        terms.append(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _zvalue_sql(x: str, y: str) -> str:
    """The identical interleave as DuckDB integer arithmetic."""
    terms = []
    for i in range(_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH coords AS (
  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
), zvals AS (
  SELECT x, y, ({_zvalue_sql('x', 'y')}) >> {_BUCKET_SHIFT} AS z_bucket
  FROM coords
)
SELECT z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM zvals
GROUP BY z_bucket
"""


@register("q_zorder_layout", oracle=_ZORDER_ORACLE, tags=("layout", "scale"))
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code layout rule over (l_partkey % 256, l_suppkey % 256):
    16-bit Z-value, bucketed by its top 4 bits — the file-assignment
    step of an OPTIMIZE ZORDER writer (module docstring).  Output is
    each bucket's row count and min/max envelope of both dimensions;
    the envelopes being 64-wide on x AND y is the clustering property
    that makes min/max scan pruning work on either predicate.  Pure
    integer shift/and arithmetic: one codegen stage and a 16-group
    aggregate, no window, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    coords = li.select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
    )
    zb = F.shiftright(
        _zvalue(F.col("x"), F.col("y")), _BUCKET_SHIFT
    ).alias("z_bucket")
    return (
        coords.select("x", "y", zb)
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
