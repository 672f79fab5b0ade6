"""Operator utilities — the reference's small CLI helpers as functions.

filter_helper: cmd/filter-helper/main.go — test filter rules against table
names before deploying a task: for each (schema, table), report whether
the block/allow list keeps it and where routing would send it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.config import TaskConfig
from tiflow_spark.operators.filters import table_filter_predicate
from tiflow_spark.operators.transforms import route


def filter_helper(
    spark: SparkSession, cfg: TaskConfig, names: list[tuple[str, str]]
) -> DataFrame:
    """(schema, table) pairs → (kept, target_schema, target_table)."""
    df = spark.createDataFrame(names, ["schema", "table"])
    kept = df.withColumn("kept", table_filter_predicate(cfg))
    routed = route(kept, cfg)
    return routed.select(
        "schema",
        "table",
        "kept",
        F.when(F.col("kept"), F.col("target_schema")).alias("target_schema"),
        F.when(F.col("kept"), F.col("target_table")).alias("target_table"),
    )


def target_maintenance(
    spark: SparkSession, path: str, action: str, **kwargs
) -> dict:
    """Maintenance surface for a hash-bucket target — the `cdc cli` /
    dmctl analog for the engine's own storage (compaction, GC, resize,
    truncate recovery). Returns a small status dict the caller can log.

    Actions:
      compact          — fold merge-on-read deltas into buckets
      purge            — reclaim tombstones below kwargs[safepoint_ts]
                         (pkg/txnutil/gc safepoint semantics)
      resize           — re-home to kwargs[n_buckets] buckets
      recover-table    — clear a truncate watermark for kwargs[table]
                         (FLASHBACK/recover table job type)
      status           — bucket/delta/meta inventory, no changes
    """
    import os

    from tiflow_spark.sinks.bucketed import (
        compact_deltas,
        list_deltas,
        purge_tombstones,
        read_target_meta,
        recover_table,
        resize_buckets,
    )

    if action == "compact":
        folded = compact_deltas(spark, path)
        return {"action": action, "deltas_folded": folded}
    if action == "purge":
        purge_tombstones(spark, path, int(kwargs["safepoint_ts"]))
        return {"action": action, "safepoint_ts": int(kwargs["safepoint_ts"])}
    if action == "resize":
        resize_buckets(spark, path, int(kwargs["n_buckets"]))
        return {"action": action, "n_buckets": int(kwargs["n_buckets"])}
    if action == "recover-table":
        recover_table(path, kwargs["table"])
        return {"action": action, "table": kwargs["table"]}
    if action == "status":
        meta = read_target_meta(path) or {}
        buckets = [
            d for d in os.listdir(path) if d.startswith("bucket=")
        ] if os.path.isdir(path) else []
        return {
            "action": action,
            "n_buckets_meta": meta.get("n_buckets"),
            "n_bucket_dirs": len(buckets),
            "pending_deltas": list_deltas(path),
            "truncates": meta.get("truncates") or {},
            "key_cols": meta.get("key_cols"),
        }
    raise ValueError(f"unknown maintenance action: {action}")
