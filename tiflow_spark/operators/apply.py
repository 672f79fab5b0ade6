"""Changelog apply — materialize the net effect of a change stream.

The reference's MySQL sink generates per-row DML (REPLACE/UPDATE/DELETE,
cdc/sink/dmlsink/txn/mysql/dml.go) and batches it; DM's worker does the same
through N causality queues (dm/syncer/dml_worker.go). The Spark-native
equivalent is a MERGE: union the target snapshot with the change stream,
keep the winning version per key, drop deletes. Idempotent by construction
(max-(commit_ts,seq)-wins), which subsumes safe-mode REPLACE semantics
(dm/syncer/safe_mode.go).

Batch form below; streaming form = the same function inside foreachBatch
(streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.operators.compactor import last_state_per_key


def changes_to_state(env: DataFrame, table_col: str = "table") -> DataFrame:
    """Pure-stream apply: final table state from a change stream alone.

    Keeps the last event per key (one shuffle), drops keys whose final op is
    D. Returns (table, key, id, balance, note) rows — the applied image.
    """
    last = last_state_per_key(env, table_col)
    return (
        last.filter(F.col("op") != "D")
        .select(
            F.col(table_col).alias("target_table"),
            F.col("key"),
            F.col("after.id").alias("id"),
            F.col("after.balance").alias("balance"),
            F.col("after.note").alias("note"),
        )
    )


def merge_into_snapshot(
    snapshot: DataFrame,
    env: DataFrame,
    key_cols: list[str],
    table_col: str = "table",
) -> DataFrame:
    """MERGE a change stream into an existing snapshot (upsert + delete).

    snapshot: current target table (key_cols + payload columns matching the
    envelope's after-image fields). Result = snapshot ⟕ net-changes with
    last-writer-wins; net deletes remove rows.

    Scale shape: one shuffle of the (compacted) change stream + one shuffle
    of the snapshot on the same keys; with a bucketed/partitioned target the
    snapshot side reuses its layout. The change side should be orders of
    magnitude smaller than the snapshot — Catalyst broadcast-joins it when
    under the threshold.
    """
    last = last_state_per_key(env, table_col)
    changes = last.select(
        F.col("key"),
        F.col("op"),
        F.col("after.id").alias("id"),
        F.col("after.balance").alias("balance"),
        F.col("after.note").alias("note"),
    )
    joined = snapshot.alias("t").join(
        F.broadcast(changes.alias("c")) if _small(changes) else changes.alias("c"),
        on=[snapshot[k] == changes[k] for k in key_cols],
        how="full_outer",
    )
    keep_change = F.col("c.op").isNotNull() & (F.col("c.op") != "D")
    keep_target = F.col("c.op").isNull()
    payload = [
        c for c in snapshot.columns if c not in key_cols
    ]
    out_cols = [
        F.coalesce(F.col(f"c.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols
    ] + [
        F.when(keep_change, F.col(f"c.{p}"))
        .otherwise(F.col(f"t.{p}"))
        .alias(p)
        for p in payload
    ]
    return joined.filter(keep_change | keep_target).select(*out_cols)


def _small(df: DataFrame) -> bool:
    # heuristic only used in local tests; on a cluster AQE decides.
    return False
