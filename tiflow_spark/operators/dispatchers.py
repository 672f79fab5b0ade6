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


_TOPIC_EXPR_RE = re.compile(
    r"[A-Za-z0-9\._\-]*(\{schema\})?([A-Za-z0-9\._\-]*\{table\})?"
    r"[A-Za-z0-9\._\-]*"
)
_AVRO_TOPIC_EXPR_RE = re.compile(
    r"[A-Za-z0-9\._\-]*\{schema\}[A-Za-z0-9\._\-]*\{table\}"
    r"[A-Za-z0-9\._\-]*"
)
# characters forbidden in a kafka topic name (expression.go kafkaForbidRE)
_KAFKA_FORBID = r"[^a-zA-Z0-9\._\-]"
_KAFKA_TOPIC_MAX = 249


def validate_topic_expression(template: str, protocol: str = "") -> None:
    """Changefeed-create-time topic-expression validation
    (dispatcher/topic/expression.go:64-84): the general form is
    [prefix]{schema}[middle][{table}][suffix] with prefix/middle/suffix
    limited to [A-Za-z0-9._-]; the AVRO protocol additionally REQUIRES
    both {schema} and {table} placeholders (ValidateForAvro — avro maps
    one subject per table, so a shared topic is rejected at create time,
    event_router.go:269)."""
    rex = _AVRO_TOPIC_EXPR_RE if protocol == "avro" else _TOPIC_EXPR_RE
    if not rex.fullmatch(template):
        detail = (
            "topic rule for avro protocol must contain both {schema} "
            "and {table}"
            if protocol == "avro"
            else "allowed form is [prefix]{schema}[middle][{table}]"
            "[suffix] over [A-Za-z0-9._-]"
        )
        raise ValueError(
            f"invalid topic expression {template!r}: {detail}"
        )


def substitute_topic(
    template: str | None,
    schema_col: str = "schema",
    table_col: str = "table",
) -> Column:
    """topic_column + the reference's Substitute() sanitization
    (expression.go:86-111): characters outside [A-Za-z0-9._-] in the
    SCHEMA/TABLE VALUES are replaced with '_' (kafka forbids them in
    topic names), the result is truncated to kafka's 249-char max, and
    the degenerate names '.' / '..' (invalid in kafka) map to '_' /
    '__'. All JVM-side regexp/substring — no UDF."""
    if not template:
        return F.concat_ws(".", F.col(schema_col), F.col(table_col))
    parts: list[Column] = []
    for tok in re.split(r"(\{schema\}|\{table\})", template):
        if tok == "{schema}":
            parts.append(
                F.regexp_replace(F.col(schema_col), _KAFKA_FORBID, "_")
            )
        elif tok == "{table}":
            parts.append(
                F.regexp_replace(F.col(table_col), _KAFKA_FORBID, "_")
            )
        elif tok:
            parts.append(F.lit(tok))
    name = F.substring(F.concat(*parts), 1, _KAFKA_TOPIC_MAX)
    return (
        F.when(name == ".", F.lit("_"))
        .when(name == "..", F.lit("__"))
        .otherwise(name)
    )


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
