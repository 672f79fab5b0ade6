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
# goes more than ~4 rounds without a hard-signal row. Round 8 (per VERDICT
# r7 next-round #1): ALL 29 queries whose latest check was round 4 (the
# longest-unaudited block, fully cleared this round) + the 8 queries new in
# round 8 (the four consumer_replay_* protocols now oracle-checked e2e
# against the shared update-split fold, llm_ingest_funnel = the standing
# streaming-ingest subsystem hard-signaled, snapshot_load_status = the DM
# loader query-status facade, text_line_dedup = C4-style line boilerplate
# removal, dedup_span_remove = exact substring dedup)
# + 2 round-8 PLAN-CHANGED re-checks (sample_ppl_buckets now computes
# exact histogram-derived tercile cutoffs — no sample, no window;
# validate_resume_report now assembles from the checkpointed row-diff
# outcomes) + the 11 oldest r5-checked names in name order. The remaining
# 38 r5-checked names rotate first in round 9; every deferred name is
# meanwhile covered by the local sf0.001 oracle sweep on every pytest run
# (tests/test_parity.py) and the opt-in sf0.1 full sweep. The remainder
# follows in registration order as regression sentinels.
_PRIORITY = [
    # latest-checked round 4 — all 29, longest-unaudited first
    "olap_daily_event_rollup",
    "olap_disjunctive_revenue",
    "olap_late_shipments",
    "olap_local_supplier_volume",
    "olap_lost_customers",
    "olap_nation_volume",
    "olap_order_priority",
    "olap_pricing_summary",
    "olap_promo_revenue",
    "olap_shipping_priority",
    "olap_sliding_rate",
    "olap_small_qty_revenue",
    "olap_top_spenders",
    "olap_top_supplier",
    "olap_user_sessions",
    "olap_waiting_suppliers",
    "pack_sequences",
    "sample_stratified",
    "sample_temperature",
    "sim_ann_recall",
    "sim_ann_sq",
    "sink_uri_route",
    "snapshot_merge_partial",
    "stream_delta_merge",
    "text_contamination",
    "text_normalize",
    "text_pii_scrub",
    "text_rarity",
    "text_repetition",
    # new in round 8 (never driver-checked)
    "consumer_replay_debezium",
    "consumer_replay_canal",
    "consumer_replay_open",
    "consumer_replay_avro",
    "llm_ingest_funnel",
    "snapshot_load_status",
    "text_line_dedup",
    "dedup_span_remove",
    # round-8 plan-changed re-checks
    "sample_ppl_buckets",
    "validate_resume_report",
    # oldest of the r5-checked block (11 of 49, name order)
    "cdc_apply",
    "cdc_compact",
    "cdc_filter_stack",
    "cdc_handle_key_dispatch",
    "cdc_partition_ddl",
    "cdc_rekey_force_fallback",
    "cdc_route_split",
    "cdc_stored_generated",
    "codec_claim_check",
    "codec_maxwell_ddl",
    "codec_open_ddl",
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
