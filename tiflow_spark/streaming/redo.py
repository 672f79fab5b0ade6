"""Redo log — consistency WAL with point-in-time replay.

Reference: cdc/redo/{manager,meta_manager}.go + writer/reader (RedoLogWriter
:37): row/DDL events are appended to S3/NFS *before* the sink confirms, so
after a disaster the downstream can be rolled forward to a consistent
checkpoint by replaying the log up to the recovery point.

Spark shape: the log is an append-only parquet table of envelope rows plus
a monotone `log_seq` — written by the same micro-batch that feeds the sink
(Structured Streaming's own WAL covers source offsets; this covers the
*data* so any downstream, not just the original one, can be rebuilt).
Replay = scan(log).filter(commit_ts <= recovery_ts) → the normal apply
operator; the filter prunes on the log's date partitioning at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.operators.apply import changes_to_state


def append_redo_log(env: DataFrame, log_dir: str) -> None:
    """Append a batch of envelope rows to the redo log, date-partitioned so
    replay and retention prune by partition."""
    (
        env.withColumn(
            "log_date",
            F.date_format(F.timestamp_micros(F.col("commit_ts")), "yyyy-MM-dd"),
        )
        .write.mode("append")
        .partitionBy("log_date")
        .parquet(log_dir)
    )


def read_redo_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.parquet(log_dir).drop("log_date")


def replay(
    log: DataFrame, recovery_ts, table_col: str = "table"
) -> DataFrame:
    """Roll the log forward to ``recovery_ts`` (meta_manager's resolved
    checkpoint): events past the recovery point are discarded, the rest
    re-applied with the idempotent last-state MERGE — replaying twice is a
    no-op, the same at-least-once + idempotent-apply contract the
    reference's redo applier documents."""
    from pyspark.sql import Column

    cut = (
        recovery_ts
        if isinstance(recovery_ts, Column)
        else F.lit(recovery_ts)
    )
    return changes_to_state(
        log.filter(F.col("commit_ts") <= cut).drop("_recovery_ts"), table_col
    )
