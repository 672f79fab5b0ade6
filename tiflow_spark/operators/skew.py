"""Skew handling — salting for hot keys, the 100-TB insurance policy.

The reference hits the same problem as us: one hot table/key serializes a
worker queue (causality.go routes all conflicting rows to one queue;
docs/design/2024-01-22-ticdc-large-txn-not-block-wm.md is an entire design
doc about one large transaction stalling the watermark). Spark-side the
failure mode is one straggler shuffle partition.

Two remedies, composable with every operator here:

- AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  default in `session.get_spark`) — handles skewed *joins* at runtime.
- Explicit salting (this module) — for skewed *aggregations/windows* where
  AQE can't split, because correctness is per-key: aggregate partially per
  (key, salt), then merge the partials per key. Two shuffles, but the
  first carries the skew fanned out over `n_salts` tasks and the second
  only sees pre-combined partials (n_keys × n_salts rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row-level salt (hash of the whole row's seq/ts, not
    random — replays must land identically for idempotent apply)."""
    basis = [F.col(c) for c in ("seq", "commit_ts") if c in df.columns] or [
        F.spark_partition_id()
    ]
    return df.withColumn(salt_col, F.pmod(F.hash(*basis), F.lit(n_salts)))


def salted_count(
    df: DataFrame, keys: list[str | Column], n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-proof count per key: partial count per (key, salt) →
    merge per key. The classic fix when one key holds 30% of the rows."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, F.col("_salt")).agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))


def salted_last_state(
    env: DataFrame,
    table_col: str = "table",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof last-state-per-key: per-(key, salt) local winner first
    (each hot key's rows split across `n_salts` tasks), then the tiny
    per-key final round. Same result as compactor.last_state_per_key —
    verified by the parity suite — but the heavy shuffle is salted.

    Use when a single key dominates the stream (hot row, large txn); the
    unsalted single-window form wins when keys are well distributed.
    """
    from tiflow_spark.operators.compactor import op_weight

    ord_desc = [
        F.col("commit_ts").desc(),
        F.col("seq").desc(),
        op_weight().desc(),
    ]
    salted = with_salt(env, n_salts)
    from pyspark.sql import Window

    w1 = Window.partitionBy(table_col, "key", "_salt").orderBy(*ord_desc)
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w2 = Window.partitionBy(table_col, "key").orderBy(*ord_desc)
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
