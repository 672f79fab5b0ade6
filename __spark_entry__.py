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
# goes more than ~4 rounds without a hard-signal row. Round 11 (per VERDICT
# r10 next-round #1/#2): FIRST the five round-10 rows that landed after the
# r10 rotation snapshot and therefore have no driver CORRECTNESS entry yet
# (the only registry entries without one), then the rows NEW in round 11
# (codec_claim_check_raw_value — the claim-check external-payload formats +
# consumer reassembly; codec_claim_check_canal_envelope — the canal-json
# protocol-faithful on-topic location envelope; codec_open_claim_check —
# the open-protocol ccl key + framed external payload;
# codec_simple_claim_check — the simple-protocol claimCheckLocation +
# handleKeyOnly location message; codec_open_handle_key_only and
# codec_simple_handle_key_only — the per-protocol large-message
# handle-key-only re-marshals; all six surfaced
# by the r10 #6 reference probe of pkg/sink/kafka/claimcheck and the
# per-codec location-message encoders; codec_simple_avro_roundtrip and
# codec_simple_avro_events, codec_simple_avro_ddl — the simple protocol's
# encoding-format=avro wire, simple/avro.go + message.json;
# codec_canal_protobuf and codec_canal_protobuf_ddl — the legacy
# Alibaba-Canal protobuf wire, canal_encoder.go/canal_entry.go over
# proto/EntryProtocol.proto; dedup_paragraph_first_wins — the Dolma/BFF
# paragraph-mode first-occurrence-wins dedup; consumer_replay_simple —
# the sixth kafka-consumer protocol branch e2e;
# codec_avro_handling_modes — the avro decimal/unsigned-bigint handling
# knobs, avro.go:698-731/820-876), then the two PLAN-CHANGED re-checks
# (corpus_select_budget — r10 eager window-free snapshot rewrite;
# dedup_span_remove_minlen — r10 linear run-merge rewrite + r11's
# when/otherwise run-start guard from ADVICE r10; both verified
# output-identical against their DuckDB oracles at sf0.001 + sf0.01 under a
# vanilla driver-style session this round), then 29 of the 47 queries whose
# latest driver check was round 7 (name order). The eighteen r7 names
# that miss the cap (dedup_keep_best, dedup_minhash_capped,
# filter_helper, handle_error_dlq, join_asof, join_range, mm_decode_real,
# mm_frame_sample, mq_consumer_flush, precheck_structure, sample_dsir,
# sample_unimax, shardddl_enforce, snapshot_load_resume,
# text_gopher_rules, text_top_ngrams, validate_binsearch,
# validate_resume) lead the r12 rotation; every
# deferred name is meanwhile covered by the sf0.001 oracle sweep on every
# pytest run (tests/test_parity.py) and the opt-in sf0.1 full sweep. The
# remainder follows in registration order as regression sentinels.
_PRIORITY = [
    # round-10 rows never driver-checked (VERDICT r10 #1)
    "codec_canal_trimmed_images",
    "codec_compress_roundtrip",
    "codec_debezium_schema_block",
    "codec_open_old_value",
    "codec_simple_bootstrap_resend",
    # new in round 11 + plan-changed re-checks
    "codec_claim_check_raw_value",
    "codec_claim_check_canal_envelope",
    "codec_open_claim_check",
    "codec_simple_claim_check",
    "codec_open_handle_key_only",
    "codec_simple_handle_key_only",
    "codec_simple_avro_roundtrip",
    "codec_simple_avro_events",
    "codec_simple_avro_ddl",
    "codec_canal_protobuf",
    "codec_canal_protobuf_ddl",
    "dedup_paragraph_first_wins",
    "consumer_replay_simple",
    "codec_avro_handling_modes",
    "corpus_select_budget",
    "dedup_span_remove_minlen",
    # latest-checked round 7 — first 37 in name order (VERDICT r10 #2)
    "cdc_bdr_filter",
    "cdc_charset_decode",
    "cdc_envelope",
    "cdc_filter_summary",
    "cdc_force_replicate",
    "cdc_generated_columns",
    "cdc_metrics",
    "cdc_partition_route",
    "cdc_row_checksum",
    "cdc_safe_mode_window",
    "cdc_topic_template",
    "cdc_txn_holdout_wm",
    "cdc_txn_split",
    "cdc_typed_apply",
    "cdc_vector_type",
    "codec_avro_glue",
    "codec_canal_json_ddl",
    "codec_csv",
    "codec_handle_key_only",
    "codec_maxwell",
    "codec_simple",
    "corpus_chunk",
    "corpus_export_shards",
    "corpus_funnel",
    "corpus_profile",
    "data_epoch_shuffle",
    "data_split",
    "dedup_groups",
    "dedup_index_compact",
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
