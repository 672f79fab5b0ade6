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
# goes more than ~4 rounds without a hard-signal row. Round 9 (per VERDICT
# r8 next-round #1): ALL 38 queries whose latest check was round 5 — the
# entire remaining stale block, so after this round nothing is staler than
# r6 and the full-registry cycle stays <= 4 rounds — + the 4 queries new in
# round 9 (consumer_replay_storage_csv = cmd/storage-consumer parity, the
# last reference consumer binary without a hard-signal row;
# dedup_span_remove_minlen = Lee et al. span-length semantics;
# llm_ingest_stream = the ingest driven through run_corpus_ingest's
# availableNow trigger + checkpoint + in-stream compaction;
# compact_ingest_state = the state-maintenance fold, decisions
# byte-identical) + 3 round-9 PLAN-CHANGED re-checks (corpus_select_budget:
# band offsets now bounded driver prefix-sum, the last data-dependent
# global-order window removed; text_line_dedup: blank lines exempt from the
# hot set; consumer_replay_avro: topic split on first dot;
# consumer_replay_canal: the key-sticky contract assert is now folded into
# the fold's filter — the r8 free-standing asserted column was pruned by
# Catalyst, i.e. the guard was dead; a negative test now pins it live) +
# the 4 oldest r6-checked names in name order. Every deferred name is
# meanwhile covered
# by the local sf0.001 oracle sweep on every pytest run
# (tests/test_parity.py) and the opt-in sf0.1 full sweep. The remainder
# follows in registration order as regression sentinels.
_PRIORITY = [
    # latest-checked round 5 — all 38, the whole remaining stale block
    "ddl_barrier_plan",
    "ddl_default_backfill",
    "ddl_filter",
    "ddl_key_metadata",
    "ddl_lossy_report",
    "ddl_schema_evolution",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "olap_customer_distribution",
    "olap_large_orders",
    "olap_market_share",
    "olap_returned_items",
    "olap_volume_shipping",
    "online_ddl_route",
    "precheck",
    "sample_domain_cap",
    "schema_asof_decode",
    "shardddl_optimistic_merge",
    "sim_ann_lsh",
    "sim_embedding_neardup",
    "sim_topk_cosine",
    "sink_storage_layout",
    "sink_storage_roundtrip",
    "snapshot_merge",
    "stream_apply",
    "text_fingerprint",
    "text_langid",
    "text_lm_score",
    "text_quality",
    "text_token_counts",
    "validate_checksum",
    "validate_chunk_compare",
    "validate_pending",
    "validate_repair",
    "validate_row_diff",
    # new in round 9 (never driver-checked)
    "consumer_replay_storage_csv",
    "dedup_span_remove_minlen",
    "llm_ingest_stream",
    "compact_ingest_state",
    # round-9 plan-changed re-checks
    "corpus_select_budget",
    "text_line_dedup",
    "consumer_replay_avro",
    "consumer_replay_canal",
    # oldest of the r6-checked block (4 of 50, name order)
    "cdc_causality",
    "cdc_causality_fk",
    "cdc_checkpoint",
    "cdc_column_ops",
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
