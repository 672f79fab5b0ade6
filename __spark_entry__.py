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
# With more than 50 registered, we rotate coverage across rounds so no query
# goes more than ~2 rounds without a hard-signal row. Round 6: the 22 queries
# added this round (never driver-checked) + olap_important_parts (changed
# this round: scale-stable Q11 threshold, needs a fresh hard-signal row)
# + 27 of the 45 whose latest check was round 3 — the longest-unaudited
# set. The eighteen r3-checked deferrals to
# round 7 (cdc_envelope, cdc_metrics, filter_helper, cdc_filter_summary,
# data_split, precheck_structure, dedup_groups, handle_error_dlq,
# validate_binsearch, mm_frame_sample, codec_canal_json_ddl, cdc_typed_apply,
# shardddl_enforce, codec_csv, codec_simple, cdc_topic_template,
# cdc_row_checksum, codec_maxwell)
# are each exercised continuously by the bench harness / unit paths (the
# filter stack itself is r5-green via cdc_filter_stack; canal-json DDL
# encoding is in-cap via sink_storage_canal_roundtrip; the type matrix via
# cdc_type_fidelity; shardddl enforcement via test_shardddl_enforce.py;
# csv/simple codecs via tests/test_codecs.py + the in-cap bootstrap and
# consumer-replay rows; topic templates via the in-cap cdc_dispatch;
# row checksums via the r5-green validate_checksum on the same hashing;
# maxwell DML via tests/test_codecs.py + the r5-green codec_maxwell_ddl)
# meanwhile. The remainder follows in registration order as regression
# sentinels.
_PRIORITY = [
    # new in round 6 (never driver-checked): the capped incremental dedup,
    # the two new codec DDL surfaces, the partsupp-analog olap trio, PQ-ANN
    "dedup_incremental_capped",
    "codec_debezium_ddl",
    "codec_simple_ddl",
    "olap_mincost_supplier",
    "olap_supplier_part_counts",
    "olap_excess_suppliers",
    "sim_ann_pq",
    "sim_ann_pq_recall",
    "codec_checkpoint_messages",
    "codec_avro_watermark",
    "codec_craft_events",
    "sink_storage_canal_roundtrip",
    "olap_product_profit",
    "olap_forecast_revenue",
    "cluster_kmeans_lloyd",
    "dedup_semdedup",
    "validate_summary_report",
    "sched_rebalance",
    "sched_drain_capture",
    "dedup_span_coverage",
    "dedup_semdedup_prune",
    "sched_split_spans",
    "olap_important_parts",
    "cdc_frontier",
    "cdc_dispatch",
    "codec_canal_json",
    "codec_debezium",
    "codec_open_protocol",
    "ddl_truncate",
    "cdc_column_ops",
    "cdc_safe_mode",
    "cdc_causality",
    "ddl_drop_column",
    "ddl_rename_table",
    "ddl_multi_schema_change",
    "sink_mq_roundtrip",
    "shardddl_barrier",
    "codec_simple_bootstrap",
    "sink_mysql_dml",
    "codec_avro_roundtrip",
    "mm_feature_extract",
    "redo_replay",
    "cdc_checkpoint",
    "codec_open_batched",
    "sim_ann_ivf",
    "cdc_type_fidelity",
    "cdc_causality_fk",
    "codec_craft_roundtrip",
    "snapshot_chunks",
    "shardddl_optimistic",
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
