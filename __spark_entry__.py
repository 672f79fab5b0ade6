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
# With more than 50 registered, we rotate coverage across rounds: every
# query in this list was EITHER added this round OR had no CORRECTNESS_r03
# row (r3's window covered the round-2/3 additions; these are the r1/r2
# stalwarts rotating back in), so each registered query keeps accumulating
# recent driver-checked rows.  The remainder follows in registration order
# as regression sentinels.
_PRIORITY = [
    # new in round 5 (never driver-checked)
    "ddl_key_metadata",
    "cdc_handle_key_dispatch",
    "ddl_default_backfill",
    "cdc_partition_ddl",
    "cdc_stored_generated",
    "shardddl_optimistic_merge",
    "olap_returned_items",
    "olap_customer_distribution",
    "olap_important_parts",
    "olap_volume_shipping",
    "sample_domain_cap",
    "text_lm_score",
    "dedup_incremental",
    "cdc_rekey_force_fallback",
    "ddl_lossy_report",
    "codec_maxwell_ddl",
    "codec_open_ddl",
    "olap_market_share",
    # last driver-checked in round 2 — the longest-unaudited 27
    "codec_claim_check",
    "ddl_barrier_plan",
    "ddl_filter",
    "ddl_schema_evolution",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "olap_large_orders",
    "online_ddl_route",
    "precheck",
    "schema_asof_decode",
    "sim_ann_lsh",
    "sim_embedding_neardup",
    "sim_topk_cosine",
    "sink_storage_layout",
    "sink_storage_roundtrip",
    "snapshot_merge",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_counts",
    "validate_checksum",
    "validate_chunk_compare",
    "validate_pending",
    "validate_repair",
    "validate_row_diff",
    # last driver-checked in round 3 — next-oldest, fills the 50-cap
    "cdc_apply",
    "cdc_compact",
    "cdc_filter_stack",
    "cdc_route_split",
    "stream_apply",
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
