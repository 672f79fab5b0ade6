"""Operator utilities — the reference's small CLI helpers as functions.

filter_helper: cmd/filter-helper/main.go — test filter rules against table
names before deploying a task: for each (schema, table), report whether
the block/allow list keeps it and where routing would send it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.config import TaskConfig
from tiflow_spark.operators.filters import table_filter_predicate
from tiflow_spark.operators.transforms import route


def filter_helper(
    spark: SparkSession, cfg: TaskConfig, names: list[tuple[str, str]]
) -> DataFrame:
    """(schema, table) pairs → (kept, target_schema, target_table)."""
    df = spark.createDataFrame(names, ["schema", "table"])
    kept = df.withColumn("kept", table_filter_predicate(cfg))
    routed = route(kept, cfg)
    return routed.select(
        "schema",
        "table",
        "kept",
        F.when(F.col("kept"), F.col("target_schema")).alias("target_schema"),
        F.when(F.col("kept"), F.col("target_table")).alias("target_table"),
    )
