"""Changefeed observability — resolved-ts lag, checkpoint, per-table rates.

Reference: TiCDC's per-changefeed metrics (owner/changefeed.go checkpoint
computation; the grafana surface: resolved-ts lag, table counts, rows/s)
and DM's validator/table status endpoints.

One aggregation pass over the envelope (or the progress table in streaming
mode) produces the whole dashboard row set; the global checkpoint is the
min over per-table frontiers, exactly owner/changefeed.go:379-536.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_metrics(env: DataFrame) -> DataFrame:
    """Per-table frontier metrics + the global watermark lag."""
    per_table = env.groupBy("table").agg(
        F.max("commit_ts").alias("resolved_ts"),
        F.min("commit_ts").alias("first_ts"),
        F.count(F.lit(1)).alias("events"),
        F.count_distinct("key").alias("active_keys"),
    )
    glob = per_table.agg(F.max("resolved_ts").alias("_g")).select("_g")
    return per_table.join(F.broadcast(glob)).select(
        "table",
        "resolved_ts",
        "events",
        "active_keys",
        (F.col("_g") - F.col("resolved_ts")).alias("resolved_lag_us"),
    )


def changefeed_checkpoint(env: DataFrame) -> DataFrame:
    """checkpoint-ts = min over table frontiers (the GC-safepoint bound,
    owner/changefeed.go): one tiny two-stage aggregation."""
    return (
        env.groupBy("table")
        .agg(F.max("commit_ts").alias("resolved_ts"))
        .agg(
            F.min("resolved_ts").alias("checkpoint_ts"),
            F.count(F.lit(1)).alias("tables"),
        )
    )
