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
import warnings
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.config import Dispatcher, TaskConfig
from tiflow_spark.functions.hashing import portable_hash64, position_inertia
from tiflow_spark.operators.filters import any_table_matches, wildcard_to_regex


def column_value_string(c: Column, dtype: str = "") -> Column:
    """model.ColumnValueString (cdc/model/sink.go:1021-1061) as a Column.

    nil → 'null'; bool → '1'/'0' (pass dtype='boolean'); ints/uints/
    strings → their natural decimal / text form (Spark's CAST ... AS
    STRING matches Go's strconv for integers and passes strings through
    unchanged). Binary key columns do NOT come through here —
    :func:`inertia_sum32` keeps their write binary end-to-end so raw
    non-UTF-8 bytes hash like Go's ``string([]byte)`` (sink.go:1056-1057)
    instead of being mangled by a UTF-8 decode. Caveat: Go formats floats
    with strconv.FormatFloat('f', -1) — never scientific notation — while
    Spark's cast switches to scientific for |x| ≥ 1e7; inertia_sum32
    warns when a float key column is configured.
    """
    if dtype == "boolean":
        s = F.when(c, F.lit("1")).otherwise(F.lit("0"))
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
        dt = (dtypes or {}).get(name, "")
        if dt in ("float", "double"):
            # Go renders floats via strconv.FormatFloat('f', -1) — never
            # scientific — but Spark's CAST AS STRING goes scientific at
            # |x| ≥ 1e7, so wire parity silently breaks there (ADVICE r13:
            # guard, don't just document).
            warnings.warn(
                f"inertia dispatch on float key column {name!r}: partition "
                "parity with TiCDC holds only for |value| < 1e7 (Go uses "
                "FormatFloat, Spark's cast switches to scientific "
                "notation)",
                stacklevel=2,
            )
        if dt == "binary":
            # byte-preserving write: Go hashes string([]byte) raw
            # (sink.go:1056-1057); a UTF-8 decode would corrupt non-UTF-8
            # bytes. concat of binary columns stays binary, and
            # position_inertia's cast-to-binary is then a no-op.
            writes.append(
                F.concat(
                    F.lit(name).cast("binary"),
                    F.coalesce(
                        img[name].cast("binary"),
                        F.lit("null").cast("binary"),
                    ),
                )
            )
        else:
            writes.append(
                F.concat(F.lit(name), column_value_string(img[name], dt))
            )
    return position_inertia(*writes)


def partition_column(
    rule: str,
    num_partitions: int,
    columns: tuple[str, ...] = (),
    hash_scheme: str = "portable",
    handle_columns: tuple[str, ...] | None = None,
    dtypes: dict[str, str] | None = None,
) -> Column:
    """partition index ∈ [0, num_partitions) for one dispatch rule.

    hash_scheme='portable' (default): the engine-portable md5 hash —
    deterministic across engines/restarts, oracle-friendly.
    hash_scheme='inertia': tiflow's actual wire hash (PositionInertia,
    XOR-folded crc32-IEEE) so partition assignments match what a real
    TiCDC deployment produces on the same topic; required when this
    engine interoperates with TiCDC-written partitions. Inertia
    index-value dispatch hashes the table's ACTUAL handle-key columns
    (the reference reads them off TableInfo, index_value.go:57-66) —
    callers must pass ``handle_columns`` explicitly (ADVICE r13: a
    silent ('id',) default computed wrong partitions for every table
    whose handle key is not literally 'id'); :func:`dispatch` resolves
    them per table from the schema registry's key metadata.
    """
    if rule == "key":
        raise ValueError(
            "rule 'key' is the pulsar literal-key dispatcher (fixed "
            "partition 0 + the rule string as message key, "
            "partition/key.go:35-48) — use literal_key_columns(), or go "
            "through dispatch() which routes it"
        )
    if hash_scheme == "inertia":
        if rule in ("default", "table"):
            h = position_inertia(F.concat(F.col("schema"), F.col("table")))
        elif rule == "ts":
            return F.pmod(F.col("commit_ts"), F.lit(num_partitions)).cast("int")
        elif rule in ("index-value", "rowid"):
            if not handle_columns:
                raise ValueError(
                    "index-value dispatch with hash_scheme='inertia' "
                    "requires explicit handle_columns (the table's handle "
                    "key, index_value.go:57-66) — there is no safe default"
                )
            h = inertia_sum32(handle_columns, dtypes=dtypes)
        elif rule == "columns":
            h = inertia_sum32(columns, dtypes=dtypes)
        else:
            raise ValueError(f"unknown partition rule: {rule}")
        return F.pmod(h, F.lit(num_partitions)).cast("int")
    return _portable_partition_column(rule, num_partitions, columns)


def inertia_message_key(
    rule: str,
    columns: tuple[str, ...] = (),
    handle_columns: tuple[str, ...] | None = None,
    dtypes: dict[str, str] | None = None,
) -> Column:
    """The MQ message key the reference emits alongside the partition:
    decimal sum32 for index-value/columns (strconv.FormatInt(int64(sum32)),
    index_value.go:85, columns.go:72), 'schema.table' for the table rule
    (TableName.String(), table.go:45, cdc/model/sink.go:216-218), the
    decimal commit-ts for the ts rule (fmt.Sprintf("%d", row.CommitTs),
    ts.go:36)."""
    if rule in ("default", "table"):
        return F.concat_ws(".", F.col("schema"), F.col("table"))
    if rule == "ts":
        return F.col("commit_ts").cast("string")
    if rule in ("index-value", "rowid"):
        if not handle_columns:
            raise ValueError(
                "index-value message key requires explicit handle_columns "
                "(see partition_column)"
            )
        return inertia_sum32(handle_columns, dtypes=dtypes).cast("string")
    if rule == "columns":
        return inertia_sum32(columns, dtypes=dtypes).cast("string")
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
    elif rule in ("index-value", "rowid"):
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
# pulsar topic forms (expression.go:43-51 pulsarTopicNameRE/REFull): a FULL
# name persistent://tenant/namespace/topic ({schema}/{table} placeholders
# allowed per segment), or a simple name (no '/')
_PULSAR_TOPIC_FULL_RE = re.compile(r"(?:persistent|non-persistent)://.*")
_PULSAR_TOPIC_RE = re.compile(
    r"(^((persistent|non-persistent)://)[A-Za-z0-9{}._\-]*/"
    r"[A-Za-z0-9{}._\-]*/[A-Za-z0-9{}._\-]*$)|"
    r"(^[A-Za-z0-9._-]*\{schema\}[A-Za-z0-9._-]*\{table\}"
    r"[A-Za-z0-9._-]*)$"
)


def validate_topic_expression(
    template: str, protocol: str = "", scheme: str = "kafka"
) -> None:
    """Changefeed-create-time topic-expression validation
    (dispatcher/topic/expression.go:64-84 + event_router.go:263-274
    validateTopicExpression): the general form is
    [prefix]{schema}[middle][{table}][suffix] with prefix/middle/suffix
    limited to [A-Za-z0-9._-]; the AVRO protocol additionally REQUIRES
    both {schema} and {table} placeholders (ValidateForAvro — avro maps
    one subject per table, so a shared topic is rejected at create time,
    event_router.go:269). A PULSAR-scheme sink validates against pulsar's
    own topic grammar instead (PulsarValidate, expression.go:111-135):
    either a full ``persistent://tenant/namespace/topic`` name (three
    '/'-separated segments, {schema}/{table} placeholders allowed) or a
    simple name that contains no '/'."""
    if scheme.startswith("pulsar"):
        if not template:
            raise ValueError(
                "invalid pulsar topic expression: topic name is empty"
            )
        if not _PULSAR_TOPIC_FULL_RE.match(template):
            if "/" in template:
                raise ValueError(
                    f"invalid pulsar topic expression {template!r}: it "
                    "should be in the format of a <topic> and topic name "
                    "must contain '{schema}' and simple topic name must "
                    "not contain '/'"
                )
        elif not _PULSAR_TOPIC_RE.match(template):
            raise ValueError(
                f"invalid pulsar topic expression {template!r}: it should "
                "be in the format of <tenant>/<namespace>/<topic> or "
                "<topic> and topic name must contain '{schema}'"
            )
        return
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


@dataclass(frozen=True)
class TableKeyInfo:
    """The slice of the reference's TableInfo the MQ dispatchers read:
    column names (OffsetsByNames, cdc/model/schema_storage.go:473),
    handle-key columns (IndexValueDispatcher's default path,
    partition/index_value.go:57-66), and named indexes with their
    uniqueness (GetIndex / IndexByName — VerifyTables,
    event_router.go:131-160)."""

    columns: tuple[str, ...] = ()
    handle_columns: tuple[str, ...] = ()
    # index name → (columns in index order, is_unique)
    indexes: dict[str, tuple[tuple[str, ...], bool]] = field(
        default_factory=dict
    )
    # optional Spark simpleString dtypes per column (boolean/binary/float
    # handling in ColumnValueString); dispatch() fills this from the
    # envelope schema when absent
    dtypes: dict[str, str] = field(default_factory=dict)


def table_key_info_from_ddl(op) -> TableKeyInfo:
    """Dispatcher key metadata off a parsed CREATE TABLE
    (sources/ddl_parse.DDLOp) — the engine's stand-in for TiDB's
    TableInfo. Handle key = PK, else the first UNIQUE key (the handle-key
    flagging the reference derives in schema storage); named indexes =
    'primary' + named UNIQUE KEYs (unique=True) + named plain KEY/INDEX
    entries (unique=False, so verify_tables can reject them)."""
    handle = op.pk_columns or (
        op.unique_keys[0] if op.unique_keys else ()
    )
    indexes: dict[str, tuple[tuple[str, ...], bool]] = {}
    if op.pk_columns:
        indexes["primary"] = (tuple(op.pk_columns), True)
    for name, cols in zip(op.unique_key_names, op.unique_keys):
        if name:
            indexes[name] = (tuple(cols), True)
    for name, cols in zip(op.plain_key_names, op.plain_keys):
        if name:
            indexes[name] = (tuple(cols), False)
    return TableKeyInfo(
        columns=tuple(c.name for c in op.columns),
        handle_columns=tuple(handle),
        indexes=indexes,
    )


def _match_dispatcher(
    cfg: TaskConfig, schema: str, table: str
) -> Dispatcher | None:
    """First matching dispatcher rule for one concrete table — the
    driver-side twin of matchDispatcher (event_router.go:197-210)."""
    for d in cfg.dispatchers:
        for r in d.tables:
            s, t = schema, table
            sp, tp = r.schema_pattern, r.table_pattern
            if not cfg.case_sensitive:
                s, t, sp, tp = s.lower(), t.lower(), sp.lower(), tp.lower()
            if re.match(wildcard_to_regex(sp), s) and re.match(
                wildcard_to_regex(tp), t
            ):
                return d
    return None


def verify_tables(
    cfg: TaskConfig,
    table_infos: dict[tuple[str, str], TableKeyInfo],
    scheme: str = "kafka",
) -> None:
    """VerifyTables parity (event_router.go:131-160) — changefeed-CREATE-
    time rejection of dispatch rules that cannot run: an index-value rule
    with a named index requires the index to EXIST and be UNIQUE on every
    matched table (a non-unique index would let an update's halves land
    on different partitions → wrong consumption order, the reference's
    stated reason); a columns rule requires every configured column to
    exist (OffsetsByNames, schema_storage.go:473-500 — matched lowercase,
    MySQL column names are case-insensitive). Error strings pin the
    reference's messages."""
    for (schema, table), info in table_infos.items():
        d = _match_dispatcher(cfg, schema, table)
        if d is None:
            continue
        rule = resolve_partition_rule(d.partition, scheme)
        if rule == "index-value" and d.index_name:
            idx = info.indexes.get(d.index_name)
            if idx is None:
                raise ValueError(
                    "index not found when verify the table, table: "
                    f"{schema}.{table}, index: {d.index_name}"
                )
            if not idx[1]:
                raise ValueError(
                    "index is not unique when verify the table, table: "
                    f"{schema}.{table}, index: {d.index_name}"
                )
        elif rule == "columns" and info.columns:
            known = {c.lower() for c in info.columns}
            for c in d.columns:
                if c.lower() not in known:
                    raise ValueError(
                        "columns not found when dispatch event, table: "
                        f"{schema}.{table}, columns: {list(d.columns)}, "
                        f"column: {c.lower()}"
                    )


def _per_table_index_value(
    d: Dispatcher,
    table_infos: dict[tuple[str, str], TableKeyInfo],
    num_partitions: int,
    default_dtypes: dict[str, str] | None = None,
) -> tuple[Column, Column]:
    """Per-table index-value dispatch branches (inertia mode): each
    matched table hashes ITS OWN key columns — the named index's columns
    in index order when the rule carries ``index=...``
    (index_value.go:67-86), else the table's handle key (:57-66). Rows
    from tables absent from the metadata raise AT EXECUTION, like the
    reference's dispatch-time ErrDispatcherFailed (:70-76) — a
    when-chain otherwise-branch of raise_error, so the error fires only
    if such a row actually flows."""
    err = F.raise_error(
        F.concat(
            F.lit(
                "index-value dispatch: no key metadata for table "
            ),
            F.col("schema"),
            F.lit("."),
            F.col("table"),
        )
    )
    part: Column = err.cast("int")
    key: Column = err.cast("string")
    for (schema, table), info in table_infos.items():
        if d.index_name:
            idx = info.indexes.get(d.index_name)
            if idx is None or not idx[1]:
                continue  # verify_tables already rejected; defensive
            cols = idx[0]
        else:
            cols = info.handle_columns
        if not cols:
            continue
        m = (F.col("schema") == F.lit(schema)) & (
            F.col("table") == F.lit(table)
        )
        h = inertia_sum32(cols, dtypes=info.dtypes or default_dtypes)
        part = F.when(
            m, F.pmod(h, F.lit(num_partitions)).cast("int")
        ).otherwise(part)
        key = F.when(m, h.cast("string")).otherwise(key)
    return part, key


def _env_dtypes(env: DataFrame) -> dict[str, str]:
    """Spark simpleString dtypes of the envelope's payload columns (the
    after-image struct) — drives ColumnValueString's boolean/binary/float
    branches without the caller hand-writing a dtype map."""
    try:
        fields = env.schema["after"].dataType.fields  # type: ignore[union-attr]
    except Exception:
        return {}
    return {f.name: f.dataType.simpleString() for f in fields}


def ddl_topic_column(
    cfg: TaskConfig,
    default_topic: str,
    schema_col: str = "schema",
    table_col: str = "table",
) -> Column:
    """GetTopicForDDL (event_router.go:96-115): a TABLE-scope DDL routes
    through the matched topic dispatcher — the same template expansion as
    its table's row events — while a SCHEMA-scope DDL (empty table name,
    e.g. CREATE/DROP DATABASE) falls back to the changefeed's DEFAULT
    topic. The unmatched-table base keeps this engine's established
    default-topic convention ('schema.table' per-table topics, the same
    base :func:`dispatch` uses for row events)."""
    topic: Column = F.concat_ws(".", F.col(schema_col), F.col(table_col))
    for d in reversed(cfg.dispatchers):
        if d.topic is None:
            continue
        m = any_table_matches(d.tables, cfg.case_sensitive)
        topic = F.when(m, topic_column(d.topic)).otherwise(topic)
    schema_scope = F.col(table_col).isNull() | (F.col(table_col) == "")
    return F.when(schema_scope, F.lit(default_topic)).otherwise(topic)


def dispatch(
    env: DataFrame,
    cfg: TaskConfig,
    num_partitions: int = 16,
    hash_scheme: str = "portable",
    scheme: str = "kafka",
    table_infos: dict[tuple[str, str], TableKeyInfo] | None = None,
) -> DataFrame:
    """Add topic/partition columns per the first matching dispatcher rule.

    hash_scheme='inertia' switches every hashed rule to tiflow's
    PositionInertia wire hash and additionally emits the reference's MQ
    `message_key` column (decimal sum32 / 'schema.table' / decimal
    commit-ts for the ts rule, ts.go:36).

    ``scheme`` is the sink URI scheme and drives the reference's
    unknown-rule fallbacks (resolve_partition_rule / getPartitionDispatcher,
    event_router.go:213-239): 'rowid' aliases to index-value everywhere;
    an unrecognized rule becomes the literal-key dispatcher on pulsar
    (partition 0, the rule string as message key) and default-with-warn
    on kafka.

    ``table_infos`` ({(schema, table): TableKeyInfo}) is the schema
    registry's key metadata: required for inertia index-value dispatch
    (per-table handle keys / named-index resolution) and checked up front
    via :func:`verify_tables` (create-time rejection parity)."""
    if table_infos:
        verify_tables(cfg, table_infos, scheme)
    dtypes = _env_dtypes(env)
    topic: Column = topic_column(None)
    part: Column = partition_column(
        "default", num_partitions, hash_scheme=hash_scheme
    )
    emit_key = hash_scheme == "inertia"
    key: Column = (
        inertia_message_key("default") if emit_key else F.lit(None).cast("string")
    )
    for d in reversed(cfg.dispatchers):
        m = any_table_matches(d.tables, cfg.case_sensitive)
        rule = resolve_partition_rule(d.partition, scheme)
        topic = F.when(m, topic_column(d.topic)).otherwise(topic)
        if rule == "key":
            p_col, k_col = literal_key_columns(d.partition)
            emit_key = True
        elif (
            hash_scheme == "inertia"
            and rule == "index-value"
            and (table_infos or d.index_name)
        ):
            if not table_infos:
                raise ValueError(
                    f"dispatcher rule index-value with index="
                    f"{d.index_name!r} needs table_infos (the schema "
                    "registry's key metadata) to resolve the index's "
                    "columns"
                )
            p_col, k_col = _per_table_index_value(
                d, table_infos, num_partitions, default_dtypes=dtypes
            )
        else:
            if hash_scheme == "inertia" and rule == "index-value":
                raise ValueError(
                    "index-value dispatch with hash_scheme='inertia' "
                    "needs table_infos (per-table handle-key metadata); "
                    "pass the schema registry's key metadata to dispatch()"
                )
            if d.index_name and rule == "index-value":
                # portable scheme hashes the envelope's pre-computed
                # handle-key string; a named index does not change it
                warnings.warn(
                    f"dispatcher index={d.index_name!r} only affects "
                    "hash_scheme='inertia' (wire parity); the portable "
                    "hash keys on the envelope's handle key column",
                    stacklevel=2,
                )
            p_col = partition_column(
                rule,
                num_partitions,
                d.columns,
                hash_scheme=hash_scheme,
                dtypes=dtypes,
            )
            k_col = (
                inertia_message_key(rule, d.columns, dtypes=dtypes)
                if hash_scheme == "inertia"
                else None
            )
        part = F.when(m, p_col).otherwise(part)
        if k_col is not None:
            key = F.when(m, k_col).otherwise(key)
    out = env.withColumn("topic", topic).withColumn(
        "partition", part.cast("int")
    )
    if emit_key:
        out = out.withColumn("message_key", key)
    return out
