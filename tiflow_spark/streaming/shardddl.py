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


def optimistic_lock_status(shard_ddl: DataFrame) -> DataFrame:
    """Optimistic shard-DDL lock status (dm/pkg/shardddl/optimism;
    dm/syncer/shardddl/optimist.go): shards apply DDL independently; the
    coordinator tracks, per target table, the JOINED schema (union of all
    shards' columns — tidb schemacmp's lattice join) and flags

    - lagging shards: missing columns of the joined schema (their DML still
      replicates — absent columns backfill NULL/default), and
    - conflicts: a column added with incompatible types across shards
      (lattice join undefined → replication must pause for that table).

    Pure aggregations + one broadcast join of tiny per-table totals; no
    driver-side state. Each shard's CURRENT type per column wins (a later
    MODIFY COLUMN supersedes the shard's earlier declaration — how a
    conflict is reconciled in optimist.go's lattice re-join); DDL frames
    without a commit_ts column fall back to distinct declarations."""
    if "commit_ts" in shard_ddl.columns:
        cols = shard_ddl.groupBy("shard", "table", "col_name").agg(
            F.max_by("col_type", F.col("commit_ts")).alias("col_type")
        )
    else:
        cols = shard_ddl.select(
            "shard", "table", "col_name", "col_type"
        ).distinct()
    per_table = cols.groupBy("table").agg(
        F.countDistinct("col_name").alias("n_joined"),
    )
    conflicts = (
        cols.groupBy("table", "col_name")
        .agg(F.countDistinct("col_type").alias("n_types"))
        .groupBy("table")
        .agg(
            F.sum((F.col("n_types") > 1).cast("long")).alias("n_conflicts")
        )
    )
    per_shard = cols.groupBy("table", "shard").agg(
        F.countDistinct("col_name").alias("n_cols")
    )
    totals = per_table.join(conflicts, "table")
    return per_shard.join(F.broadcast(totals), "table").select(
        "table",
        "shard",
        "n_cols",
        "n_joined",
        "n_conflicts",
        (
            (F.col("n_cols") == F.col("n_joined"))
            & (F.col("n_conflicts") == 0)
        ).alias("synced"),
    )


def optimistic_lock_timeline(
    shard_ddl: DataFrame, probes: DataFrame
) -> DataFrame:
    """Lock status AS-OF each probe timestamp — the declarative form of the
    optimist coordinator's state machine over time (dm/syncer/shardddl/
    optimist.go): a conflict appears when incompatible per-shard types have
    both been seen, and clears when a later DDL re-joins the lattice.

    ``probes``: (probe_label, probe_ts) — tiny; cross-joined against the
    (tiny) DDL stream, so the whole evaluation is metadata-scale."""
    seen = probes.crossJoin(shard_ddl).filter(
        F.col("commit_ts") <= F.col("probe_ts")
    )
    latest = seen.groupBy("probe_label", "shard", "table", "col_name").agg(
        F.max_by("col_type", F.col("commit_ts")).alias("col_type")
    )
    return (
        latest.groupBy("probe_label", "table", "col_name")
        .agg(F.count_distinct("col_type").alias("n_types"))
        .groupBy("probe_label", "table")
        .agg(
            F.sum((F.col("n_types") > 1).cast("long")).alias("n_conflicts")
        )
        .select(
            "probe_label",
            "table",
            "n_conflicts",
            (F.col("n_conflicts") > 0).alias("paused"),
        )
    )


def conflicted_tables_asof(shard_ddl: DataFrame, ts: int) -> set[str]:
    """Tables whose optimistic lock is in conflict among DDLs seen up to
    ``ts`` — the per-batch pause set. Metadata-scale collect (the reference
    keeps the same state in the DM-master's memory)."""
    status = optimistic_lock_status(
        shard_ddl.filter(F.col("commit_ts") <= F.lit(ts))
    )
    return {
        r.table
        for r in status.filter(F.col("n_conflicts") > 0)
        .select("table")
        .distinct()
        .collect()
    }


def lattice_join_schemas(shard_registries: DataFrame) -> DataFrame:
    """Union lattice JOIN of per-shard schemas — the optimistic mode's
    merge step (dm/pkg/shardddl/optimism/lock.go TrySync; tidb schemacmp
    Join): when shards add compatible columns in different orders, the
    joined schema is the column UNION with agreed types, and every shard
    keeps replicating (missing columns decode as NULL/default). Only a
    type-incompatible column makes the join undefined (conflict → pause,
    the case optimistic_lock_status flags).

    Input: registry rows (registry_from_ddl output) tagged with a
    ``shard`` column. Output per table: ``joined_columns`` (name-sorted —
    deterministic across shard arrival orders, exactly the lattice-join
    property under test) and ``n_conflicts``. Metadata-scale throughout.
    """
    latest = shard_registries.groupBy("shard", "table").agg(
        F.max_by(F.struct("columns", "types"), F.col("version_no")).alias(
            "_s"
        )
    )
    cols = latest.select(
        "shard",
        "table",
        F.explode("_s.columns").alias("col"),
        F.col("_s.types").alias("_types"),
    ).select(
        "shard",
        "table",
        "col",
        F.element_at("_types", F.col("col")).alias("col_type"),
    )
    per_col = cols.groupBy("table", "col").agg(
        F.count_distinct("col_type").alias("n_types")
    )
    return per_col.groupBy("table").agg(
        F.array_sort(F.collect_list("col")).alias("joined_columns"),
        F.sum((F.col("n_types") > 1).cast("long")).alias("n_conflicts"),
    )
