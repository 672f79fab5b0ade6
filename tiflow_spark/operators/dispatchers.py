"""MQ dispatchers — topic + partition placement columns.

Reference: cdc/sink/dmlsink/mq/dispatcher/event_router.go:32-262 with
partition rules default/table/ts/index-value/rowid/columns/key
(:212-241) and topic templates [prefix]{schema}[middle][{table}][suffix]
(dispatcher/topic/expression.go:33-80).

Spark-first: each rule compiles to a Column; the sink writes `topic`,
`partition`, `kafka_key` columns and hands them to the Kafka writer. Two
hash schemes: the default engine-portable md5 hash (functions/hashing.py,
deterministic across engines and restarts), and `hash_scheme='inertia'` —
tiflow's actual wire hash (PositionInertia, XOR-folded crc32-IEEE,
pkg/hash/position_inertia.go:27-56) for partition/key parity with real
TiCDC-produced topics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.config import Dispatcher, TaskConfig
from tiflow_spark.functions.hashing import portable_hash64, position_inertia
from tiflow_spark.operators.filters import any_table_matches


def column_value_string(c: Column, dtype: str = "") -> Column:
    """model.ColumnValueString (cdc/model/sink.go:1021-1061) as a Column.

    nil → 'null'; bool → '1'/'0' (pass dtype='boolean'); ints/uints/
    strings/bytes → their natural decimal / text form (Spark's CAST ...
    AS STRING matches Go's strconv for integers and passes strings/bytes
    through unchanged). Caveat: Go formats floats with
    strconv.FormatFloat('f', -1) — never scientific notation — while
    Spark's cast switches to scientific for |x| ≥ 1e7; hash float key
    columns only within that range.
    """
    if dtype == "boolean":
        s = F.when(c, F.lit("1")).otherwise(F.lit("0"))
    elif dtype == "binary":
        s = c.cast("string")
    else:
        s = c.cast("string")
    return F.coalesce(s, F.lit("null"))


def inertia_sum32(
    key_columns: tuple[str, ...],
    schema_col: str = "schema",
    table_col: str = "table",
    dtypes: dict[str, str] | None = None,
) -> Column:
    """PositionInertia.Sum32() for one row, wire-parity with tiflow.

    The reference dispatchers (partition/index_value.go:45-86,
    columns.go:44-73) do ``Write(schema, table)`` then one
    ``Write(colName, model.ColumnValueString(value))`` per key column,
    over the NEW image when present else the OLD image (dispatchCols =
    row.Columns falling back to PreColumns). A column absent from both
    images is skipped (col == nil → continue); a SQL-NULL value hashes
    as the string 'null'. Key columns are the handle key for the
    index-value rule, or the user-configured list for the columns rule.
    """
    img = F.when(F.col("after").isNotNull(), F.col("after")).otherwise(
        F.col("before")
    )
    writes = [F.concat(F.col(schema_col), F.col(table_col))]
    for name in key_columns:
        writes.append(
            F.concat(
                F.lit(name),
                column_value_string(img[name], (dtypes or {}).get(name, "")),
            )
        )
    return position_inertia(*writes)


def partition_column(
    rule: str,
    num_partitions: int,
    columns: tuple[str, ...] = (),
    hash_scheme: str = "portable",
    handle_columns: tuple[str, ...] = ("id",),
) -> Column:
    """partition index ∈ [0, num_partitions) for one dispatch rule.

    hash_scheme='portable' (default): the engine-portable md5 hash —
    deterministic across engines/restarts, oracle-friendly.
    hash_scheme='inertia': tiflow's actual wire hash (PositionInertia,
    XOR-folded crc32-IEEE) so partition assignments match what a real
    TiCDC deployment produces on the same topic; required when this
    engine interoperates with TiCDC-written partitions.
    """
    if hash_scheme == "inertia":
        if rule in ("default", "table"):
            h = position_inertia(F.concat(F.col("schema"), F.col("table")))
        elif rule == "ts":
            return F.pmod(F.col("commit_ts"), F.lit(num_partitions)).cast("int")
        elif rule in ("index-value", "rowid", "key"):
            h = inertia_sum32(handle_columns)
        elif rule == "columns":
            h = inertia_sum32(columns)
        else:
            raise ValueError(f"unknown partition rule: {rule}")
        return F.pmod(h, F.lit(num_partitions)).cast("int")
    return _portable_partition_column(rule, num_partitions, columns)


def inertia_message_key(
    rule: str,
    columns: tuple[str, ...] = (),
    handle_columns: tuple[str, ...] = ("id",),
) -> Column:
    """The MQ message key the reference emits alongside the partition:
    decimal sum32 for index-value/columns (strconv.FormatInt(int64(sum32)),
    index_value.go:85, columns.go:72), 'schema.table' for the table rule
    (TableName.String(), table.go:45, cdc/model/sink.go:216-218)."""
    if rule in ("default", "table"):
        return F.concat_ws(".", F.col("schema"), F.col("table"))
    if rule in ("index-value", "rowid", "key"):
        return inertia_sum32(handle_columns).cast("string")
    if rule == "columns":
        return inertia_sum32(columns).cast("string")
    raise ValueError(f"no message key for rule: {rule}")


def resolve_partition_rule(rule: str, scheme: str = "kafka") -> str:
    """The reference's rule-resolution fallbacks (event_router.go
    getPartitionDispatcher :213-239): 'rowid' is a deprecated alias for
    index-value; an UNRECOGNIZED rule string becomes a literal fixed
    partition KEY on a pulsar-scheme sink (NewKeyDispatcher — partition
    0, message key = the rule string itself, partition/key.go:27-48),
    and silently degrades to 'default' (with a warn) on kafka."""
    known = ("default", "ts", "table", "index-value", "columns")
    low = rule.lower()
    if low == "rowid":
        return "index-value"
    if low in known:
        return low
    if scheme.startswith("pulsar"):
        return "key"
    import warnings

    warnings.warn(
        f"partition dispatch rule {rule!r} is not "
        "default/ts/table/index-value/columns, using default",
        stacklevel=2,
    )
    return "default"


def literal_key_columns(rule: str) -> tuple[Column, Column]:
    """The pulsar KeyDispatcher pair (partition/key.go:35-48): every
    event lands on partition 0 and carries the configured string as its
    message key — the broker's own key-hash places it."""
    return F.lit(0), F.lit(rule)


def _portable_partition_column(
    rule: str, num_partitions: int, columns: tuple[str, ...] = ()
) -> Column:
    """partition index ∈ [0, num_partitions) — engine-portable md5 hash."""
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


def dispatch(
    env: DataFrame,
    cfg: TaskConfig,
    num_partitions: int = 16,
    hash_scheme: str = "portable",
) -> DataFrame:
    """Add topic/partition columns per the first matching dispatcher rule.

    hash_scheme='inertia' switches every hashed rule to tiflow's
    PositionInertia wire hash and additionally emits the reference's MQ
    `message_key` column (decimal sum32 / 'schema.table')."""
    topic: Column = topic_column(None)
    part: Column = partition_column(
        "default", num_partitions, hash_scheme=hash_scheme
    )
    key: Column = (
        inertia_message_key("default") if hash_scheme == "inertia" else F.lit(None)
    )
    for d in reversed(cfg.dispatchers):
        m = any_table_matches(d.tables, cfg.case_sensitive)
        topic = F.when(m, topic_column(d.topic)).otherwise(topic)
        part = F.when(
            m,
            partition_column(
                d.partition, num_partitions, d.columns, hash_scheme=hash_scheme
            ),
        ).otherwise(part)
        if hash_scheme == "inertia" and d.partition != "ts":
            key = F.when(
                m, inertia_message_key(d.partition, d.columns)
            ).otherwise(key)
    out = env.withColumn("topic", topic).withColumn(
        "partition", part.cast("int")
    )
    if hash_scheme == "inertia":
        out = out.withColumn("message_key", key)
    return out
