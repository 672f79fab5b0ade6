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

# The driver's correctness snapshot caps at 50 queries, taken in dict order.
# With more than 50 registered, we rotate coverage across rounds: queries
# that have no green driver row yet (r2 checked the first 50 of 73) come
# first, so every registered query accumulates a driver-checked row.  The
# remainder — all green in CORRECTNESS_r02.json — follows in registration
# order, which keeps the flagship CDC pipeline + codecs + OLAP set inside
# the window as regression sentinels.
_PRIORITY = [
    # round-2 capability work the driver hasn't touched yet
    "cdc_type_fidelity",
    "cdc_typed_apply",
    "cdc_causality_fk",
    "shardddl_optimistic",
    "shardddl_barrier",
    "shardddl_enforce",
    "codec_craft_roundtrip",
    "sink_mysql_dml",
    "redo_replay",
    "ddl_drop_column",
    "ddl_rename_table",
    "codec_canal_json_ddl",
    "handle_error_dlq",
    "validate_binsearch",
    "snapshot_chunks",
    "cdc_row_checksum",
    "sim_ann_ivf",
    "filter_helper",
    "cdc_metrics",
    "cdc_checkpoint",
    "codec_simple",
    "codec_simple_bootstrap",
    "codec_open_batched",
    "codec_avro_roundtrip",
    "mm_frame_sample",
    "mm_feature_extract",
    # new in round 3
    "precheck_structure",
    "sink_mq_roundtrip",
    "ddl_truncate",
    "dedup_groups",
    "ddl_multi_schema_change",
    "data_split",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["cdc_apply"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: REGISTRY[n][0] for n in _PRIORITY if n in REGISTRY}
    for name, (fn, _sql) in REGISTRY.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
