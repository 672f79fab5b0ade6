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
    # new in round 4 (latest additions first — never driver-checked)
    "cdc_partition_route",
    "cdc_charset_decode",
    "sample_temperature",
    "text_rarity",
    "dedup_minhash_capped",
    "data_epoch_shuffle",
    "corpus_export_shards",
    "sim_ann_recall",
    "corpus_profile",
    "cdc_generated_columns",
    "corpus_chunk",
    "cdc_force_replicate",
    "snapshot_merge_partial",
    "mm_decode_real",
    "olap_disjunctive_revenue",
    "olap_small_qty_revenue",
    "olap_lost_customers",
    "olap_waiting_suppliers",
    "corpus_select_budget",
    "olap_top_supplier",
    "stream_delta_merge",
    "cdc_txn_split",
    "cdc_txn_holdout_wm",
    "cdc_bdr_filter",
    "codec_handle_key_only",
    "pack_sequences",
    "sample_stratified",
    "mq_consumer_flush",
    "cdc_safe_mode_window",
    "olap_order_priority",
    "olap_late_shipments",
    "olap_promo_revenue",
    "text_repetition",
    "text_pii_scrub",
    "text_contamination",
    "corpus_funnel",
    "cdc_vector_type",
    "join_asof",
    "join_range",
    "olap_user_sessions",
    "olap_nation_volume",
    "sink_uri_route",
    "sim_ann_sq",
    "olap_sliding_rate",
    "text_normalize",
    # no driver row in round 3 (all green in r1/r2) — rotate back in
    "olap_pricing_summary",
    "olap_shipping_priority",
    "olap_daily_event_rollup",
    "olap_top_spenders",
    "olap_local_supplier_volume",
    "olap_large_orders",
    "ddl_filter",
    "ddl_schema_evolution",
    "ddl_barrier_plan",
    "schema_asof_decode",
    "snapshot_merge",
    "text_token_counts",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_ann_lsh",
    "sim_embedding_neardup",
    "validate_chunk_compare",
    "validate_row_diff",
    "validate_repair",
    "validate_checksum",
    "sink_storage_roundtrip",
    "sink_storage_layout",
    "validate_pending",
    "precheck",
    "online_ddl_route",
    "codec_claim_check",
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
