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
