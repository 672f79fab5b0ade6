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
# goes more than ~4 rounds without a hard-signal row. Round 13 (per VERDICT
# r12 next-round #2): FIRST the 25 queries whose latest driver check was
# round 8 — the cap-bound remainder earmarked by the r12 rotation — so after
# this round nothing in the registry is staler than r9. Then the rows NEW in
# round 13: cdc_dispatch_inertia (PositionInertia wire-parity partition
# hashing, pkg/hash/position_inertia.go:27-56, XOR-folded crc32-IEEE vs an
# independent pure-SQL CRC-32 oracle — VERDICT r12 #1), validate_chunk_tuple
# (composite/string-PK tuple chunk splitting, splitter/limit.go:306-317 +
# chunk/chunk.go:278-380 — VERDICT r12 #4), consumer_replay_debezium_typed
# (the typed-renderer DECODE loop over the 16-column fixture — VERDICT r12
# #5), and consumer_replay_canal_cc (content-compatible decode seam closed
# as a green schema-from-wire replay row, mysql_types.go:36-44 — VERDICT r12
# #6). codec_canal_content_compatible re-checks because its implementation
# CHANGED this round (per-VALUE unsigned java.sql promotion incl. an
# overflowing big_u fixture, canal_entry.go:304-366 — ADVICE r12). validate_index_pick (split-index selection by first-column
# selectivity, utils.go:1051-1094) landed late in the round and takes the
# last new-row slot. The remaining 19 slots go to the oldest r9-checked
# queries in name order; the 28 r9 names that miss the cap lead the r14
# rotation. Every deferred name
# is meanwhile covered by the sf0.001 oracle sweep on every pytest run
# (tests/test_parity.py) and the opt-in sf0.1 full sweep. The remainder
# follows in registration order as regression sentinels.
_PRIORITY = [
    # latest-checked round 8 — the earmarked remainder (VERDICT r12 #2)
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
    "sample_ppl_buckets",
    "sample_stratified",
    "sample_temperature",
    "sim_ann_recall",
    "sim_ann_sq",
    "sink_uri_route",
    "snapshot_load_status",
    "snapshot_merge_partial",
    "stream_delta_merge",
    "text_contamination",
    "text_normalize",
    "text_pii_scrub",
    "text_rarity",
    "text_repetition",
    "validate_resume_report",
    # new in round 13 + the changed-implementation re-check
    "cdc_dispatch_inertia",
    "validate_chunk_tuple",
    "consumer_replay_debezium_typed",
    "consumer_replay_canal_cc",
    "validate_index_pick",
    "codec_canal_content_compatible",
    # latest-checked round 9 — first 20 in name order
    "cdc_causality",
    "cdc_causality_fk",
    "cdc_checkpoint",
    "cdc_column_ops",
    "compact_ingest_state",
    "consumer_replay_avro",
    "consumer_replay_canal",
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
    "llm_ingest_stream",
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
