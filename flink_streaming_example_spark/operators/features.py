"""Feature-engineering operators for ML training pipelines
(SURVEY.md §2.9 spirit): the hashing trick, smoothed target encoding,
and per-group min-max normalization — the tabular-feature prep stages
that sit between raw analytics tables and a trainer.

Cross-engine exactness strategy (the repo playbook):

- The hashing trick uses the md5-first-8-hex integer hash — the one
  digest Spark and DuckDB share bit-for-bit — for both the bucket
  (mod _HASH_DIM) and the sign bit (next bit of the same hash), so
  the feature vector is a pure function of the token string.
- Target encoding emits micro-scaled BIGINT sums (double ->
  DECIMAL(30,6) via STRING -> x1e6) and applies Laplace smoothing with
  integer DIV on both engines — no float division anywhere.
- Min-max scaling lands on integer permille: ((x - min) * 1000) DIV
  (max - min) over micro-scaled balances; (x - min) >= 0 by
  construction so floor division agrees across engines.

Scale shape: feature hashing is one explode + one hash-keyed
aggregate (map-side combinable); target encoding is one fact/dim
equi-join plus a broadcast of the 1-row global prior; min-max is a
single window over the grouping key (one exchange, reused by the
in-row scale expression).  Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEC = "decimal(30,6)"

# Feature-hash dimensionality: 128 buckets keeps the output a readable
# histogram at sf0.01 while exercising real collisions (part-name
# vocabulary ~ a few hundred tokens).
_HASH_DIM = 128

# Laplace smoothing pseudo-count for the target encoder: the encode of
# a segment with n orders is pulled toward the global mean with weight
# _SMOOTH_N virtual orders — the standard leakage-damping prior.
_SMOOTH_N = 20

_FEATURE_HASH_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
), hashed AS (
  SELECT tok,
    CAST(CONCAT('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM toks WHERE tok <> ''
)
SELECT h % {_HASH_DIM} AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN (h // {_HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END)
       AS BIGINT) AS signed_sum
FROM hashed
GROUP BY bucket
"""


@register("q_feature_hash", oracle=_FEATURE_HASH_ORACLE, tags=("features", "llm"))
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): part-name
    tokens folded into a fixed 128-dim signed histogram — bucket and
    sign both derived from the portable md5 integer hash (module
    docstring), so the vector is reproducible across engines,
    partitionings and vocabulary growth (no fitted dictionary to
    ship).  One explode + one map-side-combinable aggregate."""
    part = load_table(spark, sf_dir, "part")
    toks = part.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    # (h // 128) % 2 == (h >> 7) & 1 for non-negative h — stay on the
    # integer path (no double division anywhere near the hash).
    sign = F.when(F.shiftright(h, 7) % 2 == 0, 1).otherwise(-1)
    return (
        toks.select((h % _HASH_DIM).alias("bucket"), sign.alias("sign"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("sign").cast("long").alias("signed_sum"),
        )
    )


_TARGET_ENCODE_ORACLE = f"""
WITH fact AS (
  SELECT c.c_mktsegment AS segment,
    CAST(CAST(o.o_totalprice AS STRING) AS DECIMAL(30,6)) AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT CAST(SUM(price) * 1000000 AS BIGINT) // COUNT(*) AS g_mean_micros
  FROM fact
)
SELECT f.segment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(f.price) * 1000000 AS BIGINT) AS sum_micros,
  (CAST(SUM(f.price) * 1000000 AS BIGINT) + {_SMOOTH_N} * ANY_VALUE(g.g_mean_micros))
    // (COUNT(*) + {_SMOOTH_N}) AS enc_micros
FROM fact f, g
GROUP BY f.segment
"""


@register("q_target_encode", oracle=_TARGET_ENCODE_ORACLE, tags=("features",))
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding: market segment encoded as the
    Laplace-smoothed mean order price, (sum + k*global_mean)/(n + k)
    with k=20 virtual orders — computed entirely in micro-scaled
    BIGINT with integer DIV (module docstring).  One fact/dim
    equi-join + a broadcast 1-row global prior; the categorical
    encode table this produces is itself broadcast-sized."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    fact = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == customer.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("string").cast(_DEC).alias("price"),
    )
    per_seg = fact.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(SUM(price) * 1000000 AS BIGINT)").alias("sum_micros"),
    )
    # the global prior folds from the per-segment partials (micro
    # BIGINTs sum exactly), so the fact join is scanned ONCE — the
    # oracle states the same number from the raw rows
    g = per_seg.agg(
        F.expr(
            "SUM(sum_micros) div SUM(n_orders)"
        ).alias("g_mean_micros")
    )
    return per_seg.join(F.broadcast(g), how="cross").select(
        "segment",
        "n_orders",
        "sum_micros",
        F.expr(
            f"(sum_micros + {_SMOOTH_N} * g_mean_micros) "
            f"div (n_orders + {_SMOOTH_N})"
        ).alias("enc_micros"),
    )


_MINMAX_ORACLE = """
WITH v AS (
  SELECT c_custkey, c_nationkey,
    CAST(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(30,6)) * 1000000
         AS BIGINT) AS bal_micros
  FROM customer
), rng AS (
  SELECT c_custkey, c_nationkey, bal_micros,
    MIN(bal_micros) OVER (PARTITION BY c_nationkey) AS mn,
    MAX(bal_micros) OVER (PARTITION BY c_nationkey) AS mx
  FROM v
)
SELECT c_custkey, c_nationkey,
  CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
       ELSE ((bal_micros - mn) * 1000) // (mx - mn) END AS permille
FROM rng
"""


@register("q_minmax_scale", oracle=_MINMAX_ORACLE, tags=("features",))
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization: customer balance scaled to
    [0, 1000] permille within its nation — the per-entity feature
    scaling step, exact by integer arithmetic ((x-min) >= 0 so floor
    DIV agrees across engines; degenerate single-value groups pinned
    to 0).  One window exchange on the group key; the scale
    expression is in-row, so the plan is a single shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    v = customer.select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("string").cast(_DEC).alias("dv"),
    ).select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(dv * 1000000 AS BIGINT)").alias("bal_micros"),
    )
    w = Window.partitionBy("c_nationkey")
    rng = v.select(
        "c_custkey",
        "c_nationkey",
        "bal_micros",
        F.min("bal_micros").over(w).alias("mn"),
        F.max("bal_micros").over(w).alias("mx"),
    )
    return rng.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(F.expr("((bal_micros - mn) * 1000) div (mx - mn)"))
        .alias("permille"),
    )
