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


@pytest.mark.skipif(
    not __import__("os").environ.get("TIFLOW_SPARK_FULL_SWEEP"),
    reason="set TIFLOW_SPARK_FULL_SWEEP=1 for the sf0.1 scale sweep "
    "(~25 min; full sweep green 2026-08-14)",
)
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_parity_sf01_sweep(spark, name):
    """Scale-robustness sweep: the same oracle equality at sf0.1 — 10x the
    driver's correctness scale. Catches row-count-dependent logic the
    small-sf gates can't."""
    sf = "/root/testdata/sf0.1"
    fn, sql = REGISTRY[name]
    df = fn(spark, sf)
    assert df.count() > 0, f"{name}: empty result"
    if sql is None:
        return
    ok, msg = compare(df, sql, sf)
    assert ok, f"{name}: {msg}"
