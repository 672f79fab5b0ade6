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
# goes more than ~3 rounds without a hard-signal row. Round 7 (per VERDICT
# r6 next-round #2): ALL 18 queries whose latest check was round 3 (the
# longest-unaudited block, fully cleared this round) + the 11 queries new in
# round 7 (validate_resume = sync_diff checkpoint/resume, validate_resume_report
# = crash-resume finishing its report from checkpoint state,
# codec_avro_glue = the Glue registry wire variant, dedup_index_compact =
# the stats-sidecar exact re-cap, text_gopher_rules = the integer-exact
# Gopher hard-filter battery, sample_ppl_buckets = CCNet perplexity-bucket
# sampling, dedup_keep_best = quality-aware dup-group keep policy,
# sample_unimax = UniMax language-budget waterfill, sample_dsir = DSIR
# importance resampling, snapshot_load_resume = DM loader crash-resume
# with per-chunk atomic commits, text_top_ngrams = C4-style heavy-hitter
# n-gram boilerplate report) + 21 of the 50 r4-stale queries in name
# order. The 29 r4-stale deferrals (olap_daily_event_rollup,
# olap_disjunctive_revenue,
# olap_late_shipments,
# olap_local_supplier_volume, olap_lost_customers, olap_nation_volume,
# olap_order_priority,
# olap_pricing_summary, olap_promo_revenue, olap_shipping_priority,
# olap_sliding_rate, olap_small_qty_revenue, olap_top_spenders,
# olap_top_supplier, olap_user_sessions, olap_waiting_suppliers,
# pack_sequences, sample_stratified, sample_temperature, sim_ann_recall,
# sim_ann_sq, sink_uri_route, snapshot_merge_partial, stream_delta_merge,
# text_contamination, text_normalize, text_pii_scrub, text_rarity,
# text_repetition) rotate FIRST in round 8; each is meanwhile covered by
# the local sf0.001 oracle sweep every pytest run (tests/test_parity.py)
# and several by bench/unit paths (olap_shipping_priority in the headline
# set context, stream_delta_merge by the bench stream section,
# text_*/pack_sequences by tests/test_llm_*.py). The remainder follows in
# registration order as regression sentinels.
_PRIORITY = [
    # latest-checked round 3 — all 18, longest-unaudited first
    "cdc_envelope",
    "cdc_filter_summary",
    "cdc_metrics",
    "cdc_row_checksum",
    "cdc_topic_template",
    "cdc_typed_apply",
    "codec_canal_json_ddl",
    "codec_csv",
    "codec_maxwell",
    "codec_simple",
    "data_split",
    "dedup_groups",
    "filter_helper",
    "handle_error_dlq",
    "mm_frame_sample",
    "precheck_structure",
    "shardddl_enforce",
    "validate_binsearch",
    # new in round 7 (never driver-checked)
    "validate_resume",
    "validate_resume_report",
    "codec_avro_glue",
    "dedup_index_compact",
    "text_gopher_rules",
    "sample_ppl_buckets",
    "dedup_keep_best",
    "sample_unimax",
    "sample_dsir",
    "snapshot_load_resume",
    "text_top_ngrams",
    # oldest of the r4-stale block (21 of 50, name order)
    "cdc_bdr_filter",
    "cdc_charset_decode",
    "cdc_force_replicate",
    "cdc_generated_columns",
    "cdc_partition_route",
    "cdc_safe_mode_window",
    "cdc_txn_holdout_wm",
    "cdc_txn_split",
    "cdc_vector_type",
    "codec_handle_key_only",
    "corpus_chunk",
    "corpus_export_shards",
    "corpus_funnel",
    "corpus_profile",
    "corpus_select_budget",
    "data_epoch_shuffle",
    "dedup_minhash_capped",
    "join_asof",
    "join_range",
    "mm_decode_real",
    "mq_consumer_flush",
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
