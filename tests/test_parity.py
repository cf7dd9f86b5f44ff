"""Oracle parity for every registered query — the local preview of the
driver's CORRECTNESS gate (run at the same sf as the driver, sf0.01)."""

from __future__ import annotations

import pytest

from flink_streaming_example_spark.plans.registry import all_specs
from flink_streaming_example_spark.testing import run_oracle_check

_SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(_SPECS), ids=sorted(_SPECS))
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = _SPECS[name]
    result = run_oracle_check(spark, duck, spec, sf_dir)
    assert result.ok, f"{name}: {result.detail}"


def test_approx_quantiles_accuracy(spark, duck, sf_dir):
    """q_approx_quantiles is rows-only (the GK sketch has no DuckDB
    twin); its contract is rank accuracy: each approx quantile must lie
    within the exact value span of ranks p ± 0.01 (100x the configured
    1e-4 bound) of the per-key distribution, checked against DuckDB."""
    pdf = _SPECS["q_approx_quantiles"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, row in pdf.iterrows():
        for p, col in ((0.5, "p50_approx"), (0.9, "p90_approx"), (0.99, "p99_approx")):
            lo_p, hi_p = max(p - 0.01, 0.0), min(p + 0.01, 1.0)
            lo, hi = duck.execute(
                "SELECT quantile_cont(o_totalprice, ?), "
                "quantile_cont(o_totalprice, ?) FROM orders "
                "WHERE o_orderpriority = ?",
                [lo_p, hi_p, row["o_orderpriority"]],
            ).fetchone()
            assert lo <= row[col] <= hi, (
                f"{row['o_orderpriority']} {col}: {row[col]} outside "
                f"rank-window [{lo}, {hi}]"
            )


def test_approx_distinct_accuracy(spark, sf_dir):
    """q_approx_distinct is rows-only (HLL has no DuckDB twin); its
    real contract is the error bound: each key's estimate within 10%
    (5x the configured 2% rsd) of the exact distinct count."""
    pdf = _SPECS["q_approx_distinct"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, row in pdf.iterrows():
        exact, approx = row["n_users_exact"], row["n_users_approx"]
        assert abs(approx - exact) <= max(1, 0.10 * exact), (
            f"{row['event_type']}: approx {approx} vs exact {exact}"
        )
