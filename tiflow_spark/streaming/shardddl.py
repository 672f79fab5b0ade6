"""Sharded-DDL coordination — pessimistic wait-for-all barriers.

Reference: dm/syncer/shardddl/pessimist.go + dm/pkg/shardddl/pessimism
(a DDL on a shard-merge target applies only once EVERY source shard has
streamed up to it; until then the lagging shards gate the barrier) and
cdc/owner/ddl_manager.go:508 (barrier ts = min over members).

Spark shape: barrier evaluation is one aggregation over the routed stream —
per target table, each shard's high-water commit_ts, then min() across
shards. The driver polls this tiny result between micro-batches and holds
DDL application for targets whose barrier hasn't reached the DDL ts
(driver-side control flow; no Catalyst involvement — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_barrier(routed: DataFrame, ddl_ts: int | None = None) -> DataFrame:
    """Per shard-merge target: how many member shards have streamed past
    the DDL ts, and the barrier (min of shard high-water marks).

    ``ddl_ts``: literal, or None to read a ``_ddl_ts`` column the caller
    attached (broadcast-scalar cross-join — no driver-side collect job).

    barrier_ready == true ⇔ the pessimistic lock is resolved and the DDL
    may execute downstream (pessimist.go lock synced condition)."""
    if ddl_ts is not None:
        routed = routed.withColumn("_ddl_ts", F.lit(ddl_ts))
    per_shard = routed.groupBy(
        "target_table", "schema", "table"
    ).agg(
        F.max("commit_ts").alias("shard_hwm"),
        F.max("_ddl_ts").alias("_ddl_ts"),
    )
    return per_shard.groupBy("target_table").agg(
        F.count(F.lit(1)).alias("shards_total"),
        F.sum((F.col("shard_hwm") >= F.col("_ddl_ts")).cast("long")).alias(
            "shards_reached"
        ),
        F.min("shard_hwm").alias("barrier_ts"),
        (F.min("shard_hwm") >= F.max("_ddl_ts")).alias("barrier_ready"),
    )


def gate_ddl(env: DataFrame, barrier: DataFrame) -> DataFrame:
    """Drop (hold back) DDL events of targets whose barrier isn't ready —
    the per-batch gating step run inside foreachBatch. The barrier frame is
    tiny (one row per target) → broadcast join."""
    b = F.broadcast(barrier.select("target_table", "barrier_ready"))
    return (
        env.join(b, "target_table", "left")
        .filter((F.col("op") != "DDL") | F.col("barrier_ready"))
        .drop("barrier_ready")
    )
