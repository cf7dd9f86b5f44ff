"""Skew mitigation helpers (SURVEY.md §4 — '100 TB design mandate').

AQE's skew-join splitting handles most skew automatically, but a
hot-key AGGREGATION still funnels every row of the hot key through one
reducer.  The classic fix is salting: split each key into N subkeys,
aggregate partially per (key, salt), then merge the N partials — turns
one hot reducer into N.  Only aggregates with a decomposable merge
(sum/count/min/max, decimal sums included) qualify; avg is derived as
sum/count after the merge.

The salt must be DETERMINISTIC (derived from row content, not rand())
so results are reproducible and the oracle can ignore it — here
xxhash64 of a secondary column mod N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def salted_agg(
    df: DataFrame,
    key: str,
    salt_col: str | Column,
    n_salts: int = 16,
) -> "SaltedGroup":
    """Two-phase aggregation entry point: `salted_agg(df, 'k', 'v')
    .sum_count('v', ...)` — phase 1 groups by (key, salt), phase 2
    merges partials per key."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts))
    )
    return SaltedGroup(salted, key)


class SaltedGroup:
    def __init__(self, salted: DataFrame, key: str):
        self._salted = salted
        self._key = key

    def sum_count_min_max(self, col: str, scale: int = 2) -> DataFrame:
        """Decimal-stable sum + count + min/max per key, computed as
        partial-per-(key, salt) then merged — each phase's aggregate is
        associative, so the result is identical to the unsalted plan
        (and to the SQL oracle), only the shuffle distribution differs.
        """
        partial = self._salted.groupBy(self._key, "_salt").agg(
            F.sum(F.col(col).cast(_DEC)).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
            F.min(col).alias("_pmin"),
            F.max(col).alias("_pmax"),
        )
        return partial.groupBy(self._key).agg(
            F.round(F.sum("_psum"), scale)
            .cast("double")
            .alias(f"sum_{col}"),
            F.sum("_pcnt").cast("long").alias("n_rows"),
            F.min("_pmin").alias(f"min_{col}"),
            F.max("_pmax").alias(f"max_{col}"),
        )
