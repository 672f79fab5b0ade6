"""Capture .explain('formatted') for a set of registry queries → plans/r14/.

Usage: python tools_plan_capture.py before|after [query ...]
Planning only (no execution) — cheap enough to run on a busy box.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    # headline 11
    "cdc_envelope", "cdc_filter_stack", "cdc_route_split", "cdc_compact",
    "cdc_apply", "cdc_dispatch", "validate_checksum", "cdc_typed_apply",
    "ddl_rename_table", "dedup_minhash_lsh", "corpus_funnel",
    # claim-check quartet
    "codec_claim_check_canal_envelope", "codec_open_claim_check",
    "codec_claim_check_raw_value", "codec_simple_claim_check",
    # heavy band
    "sample_ppl_buckets", "dedup_semdedup", "dedup_index_compact",
    "snapshot_load_status", "dedup_keep_best", "validate_resume",
    "text_lm_score", "dedup_incremental_capped", "cluster_kmeans_lloyd",
    "olap_product_profit", "corpus_select_budget", "validate_summary_report",
    "codec_simple_avro_ddl", "consumer_replay_storage_csv",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    from tiflow_spark.session import get_spark
    from tiflow_spark.plans.parity import REGISTRY

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in REGISTRY:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record the failure
            txt = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        n_py = txt.count("EvalPython") + txt.count("MapInPandas") + txt.count(
            "ArrowEval")
        print(f"{name}: {len(txt)} chars, Exchange={n_exch}, PyNodes={n_py}")


if __name__ == "__main__":
    main()
