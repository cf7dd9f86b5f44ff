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
