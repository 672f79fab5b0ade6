"""Every registered parity query must match its DuckDB oracle at sf0.001.

This is the local mirror of the driver's t2 correctness gate.
"""

import pytest

from tests.oracle import compare
from tiflow_spark.plans.parity import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_parity(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() > 0, f"{name}: empty result"
    if sql is None:
        return
    ok, msg = compare(df, sql, sf_dir)
    assert ok, f"{name}: {msg}"
