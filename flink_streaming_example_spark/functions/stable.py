"""Hash-stable aggregate helpers (SURVEY.md §5.2 determinism traps).

Float sums are order-dependent; Spark's final-agg merge order is not
guaranteed deterministic across runs, and differs from DuckDB's anyway.
Fix: cast each input double to DECIMAL(30,6) (both engines round the
exact binary double half-away-from-zero), sum exactly in decimal
(order-independent), round, and cast the final value back to DOUBLE so
both engines hand the driver a float64 column.

Every helper has a Spark form and a mirrored DuckDB-SQL form; parity is
empirically verified per-query by tests/test_parity.py on the same
deterministic fixtures the driver uses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def stable_sum(c: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded, as double."""
    return F.round(F.sum(_col(c).cast(_DEC)), scale).cast("double").alias(alias)


def sql_stable_sum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(30,6))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def stable_avg(c: str | Column, alias: str, scale: int = 2) -> Column:
    """AVG via exact decimal sum, IEEE double division, then round."""
    col = _col(c)
    return (
        F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(col), scale)
        .alias(alias)
    )


def sql_stable_avg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS {alias}"
    )


def rounded(c: str | Column, alias: str, scale: int = 2) -> Column:
    """Round a per-row double expression (non-aggregate)."""
    return F.round(_col(c), scale).cast("double").alias(alias)


def sql_rounded(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}), {scale}) AS DOUBLE) AS {alias}"
