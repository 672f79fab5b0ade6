"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship CDC pipeline (envelope → filter → route/split →
                  last-writer-wins apply) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame.
oracle_sql()    — matching DuckDB SQL per query (None-valued entries omitted).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiflow_spark.plans.parity import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["cdc_apply"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
