"""Streaming changefeed — the reference's TiCDC/DM sync loop on Structured
Streaming.

Mapping (SURVEY.md §3.1/§3.2):
  puller + sorter        → readStream over the envelope source (file/Kafka);
                           per-batch sortWithinPartitions restores order
  mounter/filter/route   → the SAME batch operators (pure DataFrame
                           transforms work unchanged on streaming frames)
  sink manager           → foreachBatch → idempotent MERGE into the target
                           (max-(commit_ts,seq)-wins ≈ safe-mode REPLACE)
  resolved-ts/frontier   → withWatermark + per-batch progress rows
  checkpoint-ts          → Structured Streaming checkpoint + _progress table
  syncpoint              → per-batch (batch_id, max commit_ts) records

Exactly-once story = at-least-once delivery + idempotent apply, the same
contract the reference documents (SURVEY.md §2.10): replaying a micro-batch
re-MERGEs the same (key, commit_ts, seq) winners — a no-op.

The streaming target here is a parquet-rewrite MERGE (works everywhere, fine
for tests); on a real deployment foreachBatch swaps in Delta/Iceberg
MERGE INTO or a JDBC upsert — the batch function is the pluggable seam.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.config import TaskConfig
from tiflow_spark.operators import filters as flt
from tiflow_spark.operators import transforms as tfm
from tiflow_spark.operators.compactor import last_state_per_key

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("start_ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("balance", T.DoubleType()),
                    T.StructField("note", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("balance", T.DoubleType()),
                    T.StructField("note", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_change_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based CDC source: envelope-parquet files appearing in a directory
    (mirror of the reference's cloud-storage source / kafka-consumer input).

    maxFilesPerTrigger bounds batch size — the backpressure knob the
    reference implements with memory quotas (processor/memquota)."""
    return (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def transform_stream(stream: DataFrame, cfg: TaskConfig) -> DataFrame:
    """filter → route → update-split — identical operators as batch mode."""
    out = flt.apply_filters(stream, cfg)
    out = tfm.route(out, cfg)
    return tfm.split_updates(out)


@dataclass
class StreamingTarget:
    """Parquet MERGE target + progress bookkeeping for one changefeed."""

    target_path: str
    progress_path: str
    key_col: str = "key"
    table_col: str = "target_table"

    def merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Idempotent MERGE of one micro-batch (runs on the driver inside
        foreachBatch, all heavy lifting stays distributed).

        1. compact the batch to net-last-state per key (one shuffle)
        2. union with current target state, keep max-(commit_ts,seq) winner
        3. drop deletes, atomically replace the target
        """
        spark = batch.sparkSession
        last = last_state_per_key(batch, self.table_col)
        changes = last.select(
            F.col(self.table_col).alias("target_table"),
            F.col("key"),
            F.col("op"),
            F.col("commit_ts"),
            F.col("seq"),
            F.col("after.id").alias("id"),
            F.col("after.balance").alias("balance"),
            F.col("after.note").alias("note"),
        )
        if os.path.exists(self.target_path):
            current = spark.read.parquet(self.target_path)
        else:
            current = None
        if current is not None:
            merged_src = current.withColumn("op", F.lit("I")).unionByName(
                changes, allowMissingColumns=True
            )
        else:
            merged_src = changes
        winner = last_state_per_key(
            merged_src.withColumn(
                "seq", F.coalesce(F.col("seq"), F.lit(-1))
            ).withColumn("commit_ts", F.coalesce(F.col("commit_ts"), F.lit(-1))),
            "target_table",
        )
        result = winner.filter(F.col("op") != "D").select(
            "target_table", "key", "commit_ts", "seq", "id", "balance", "note"
        )
        tmp = f"{self.target_path}.tmp-{batch_id}"
        result.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.target_path)
        # progress/syncpoint record: (batch_id, resolved_ts, rows_applied) —
        # the reference's checkpoint-ts + syncpoint store (§2.7, §2.10)
        prog = batch.groupBy().agg(
            F.lit(batch_id).alias("batch_id"),
            F.max("commit_ts").alias("resolved_ts"),
            F.count(F.lit(1)).alias("events"),
        )
        prog.write.mode("append").parquet(self.progress_path)


def run_changefeed(
    spark: SparkSession,
    source_dir: str,
    cfg: TaskConfig,
    work_dir: str,
    await_termination: bool = True,
):
    """End-to-end streaming changefeed with availableNow trigger (drains the
    source then stops — the batch-boundary semantics integration tests use)."""
    target = StreamingTarget(
        target_path=os.path.join(work_dir, "target"),
        progress_path=os.path.join(work_dir, "progress"),
    )
    stream = read_change_stream(spark, source_dir)
    transformed = transform_stream(stream, cfg)
    q = (
        transformed.writeStream.foreachBatch(target.merge_batch)
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q, target


def windowed_throughput(stream: DataFrame, watermark_delay: str = "10 seconds") -> DataFrame:
    """Event-time windowed event counts with late-data handling — the
    watermark/frontier surface (resolved-ts contract, §2.10)."""
    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(F.col("commit_ts"))
    ).withWatermark("event_time", watermark_delay)
    return with_ts.groupBy(
        F.window("event_time", "1 minute").alias("w"), F.col("table")
    ).agg(F.count(F.lit(1)).alias("events"))
