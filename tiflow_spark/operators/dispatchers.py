"""MQ dispatchers — topic + partition placement columns.

Reference: cdc/sink/dmlsink/mq/dispatcher/event_router.go:32-262 with
partition rules default/table/ts/index-value/rowid/columns/key
(:212-241) and topic templates [prefix]{schema}[middle][{table}][suffix]
(dispatcher/topic/expression.go:33-80).

Spark-first: each rule compiles to a Column; the sink writes `topic`,
`partition`, `kafka_key` columns and hands them to the Kafka writer. The
partition hash uses the engine-portable md5 hash (functions/hashing.py) so
placement is deterministic across engines and restarts — the reference has
the same requirement (same row → same partition for ordering).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.config import Dispatcher, TaskConfig
from tiflow_spark.functions.hashing import portable_hash64
from tiflow_spark.operators.filters import any_table_matches


def partition_column(rule: str, num_partitions: int, columns: tuple[str, ...] = ()) -> Column:
    """partition index ∈ [0, num_partitions) for one dispatch rule."""
    if rule in ("default", "table"):
        h = portable_hash64(F.concat_ws("\x01", F.col("schema"), F.col("table")))
    elif rule == "ts":
        return F.pmod(F.col("commit_ts"), F.lit(num_partitions)).cast("int")
    elif rule in ("index-value", "rowid", "key"):
        h = portable_hash64(
            F.concat_ws("\x01", F.col("schema"), F.col("table"), F.col("key"))
        )
    elif rule == "columns":
        cols = [
            F.coalesce(
                F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).cast("string"),
                F.lit(""),
            )
            for c in columns
        ]
        h = portable_hash64(
            F.concat_ws("\x01", F.col("schema"), F.col("table"), *cols)
        )
    else:
        raise ValueError(f"unknown partition rule: {rule}")
    return F.pmod(h, F.lit(num_partitions)).cast("int")


def topic_column(template: str | None) -> Column:
    """Expand a topic expression: {schema}/{table} placeholders, literal rest.

    e.g. 'cdc_{schema}_{table}' → concat('cdc_', schema, '_', table).
    """
    if not template:
        return F.concat_ws(".", F.col("schema"), F.col("table"))
    parts: list[Column] = []
    for tok in re.split(r"(\{schema\}|\{table\})", template):
        if tok == "{schema}":
            parts.append(F.col("schema"))
        elif tok == "{table}":
            parts.append(F.col("table"))
        elif tok:
            parts.append(F.lit(tok))
    return F.concat(*parts)


def dispatch(env: DataFrame, cfg: TaskConfig, num_partitions: int = 16) -> DataFrame:
    """Add topic/partition columns per the first matching dispatcher rule."""
    topic: Column = topic_column(None)
    part: Column = partition_column("default", num_partitions)
    for d in reversed(cfg.dispatchers):
        m = any_table_matches(d.tables, cfg.case_sensitive)
        topic = F.when(m, topic_column(d.topic)).otherwise(topic)
        part = F.when(
            m, partition_column(d.partition, num_partitions, d.columns)
        ).otherwise(part)
    return env.withColumn("topic", topic).withColumn("partition", part.cast("int"))
