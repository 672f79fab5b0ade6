"""Task / replica configuration — the engine's "query language".

Mirrors the reference's config surface (dm/config/subtask.go:83 SubTaskConfig,
cdc ReplicaConfig): block/allow lists, binlog event filters, SQL-pattern
filters, expression filters, table routes, column mappings, dispatchers.
Configs compile to DataFrame predicates/projections (see operators/) — the
Spark-first analogue of tiflow compiling them into per-event Go closures.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableRule:
    """One block/allow matcher: wildcard patterns on (schema, table).

    Pattern language = the reference's `matchers` DSL (pkg/filter via
    tidb table-filter): ``*`` any run, ``?`` one char; case-insensitive by
    default like the reference (filter.go:100-126 CaseSensitive flag).
    """

    schema_pattern: str
    table_pattern: str = "*"


@dataclass(frozen=True)
class EventFilterRule:
    """Skip events by type for matching tables
    (pkg/binlog-filter/filter.go:27-120). ``events`` uses the canonical op
    letters: I/U/D (all-dml = all three)."""

    tables: tuple[TableRule, ...]
    events: tuple[str, ...]  # subset of ("I", "U", "D")
    action: str = "Ignore"  # Ignore | Do


@dataclass(frozen=True)
class ExpressionFilterRule:
    """Skip DML when a SQL boolean expression over the row images is true
    (pkg/filter/expr_filter.go:251-382). Expressions reference columns of
    the before/after structs, e.g. ``after.balance > 100``."""

    tables: tuple[TableRule, ...]
    insert: str | None = None  # evaluated on after
    update_old: str | None = None  # evaluated on before
    update_new: str | None = None  # evaluated on after
    delete: str | None = None  # evaluated on before


@dataclass(frozen=True)
class RouteRule:
    """Regex/wildcard rename (schema, table) → (target_schema, target_table).
    N:1 routes implement shard merge (dm/syncer/syncer.go:3272-3280).
    ``extract_*`` adds source-identity columns via regex capture
    (dm/syncer/syncer.go:2821-2847 generateExtendColumn)."""

    schema_pattern: str
    table_pattern: str
    target_schema: str
    target_table: str
    extract_schema_regexp: str | None = None  # → source_schema column
    extract_table_regexp: str | None = None  # → source_table column


@dataclass(frozen=True)
class ColumnMapping:
    """Built-in value rewrites (pkg/column-mapping/column.go:42-75)."""

    tables: tuple[TableRule, ...]
    column: str
    expr: str  # "add prefix" | "add suffix" | "partition id"
    arguments: tuple[str, ...] = ()


@dataclass(frozen=True)
class Dispatcher:
    """MQ partition/topic dispatch rule
    (cdc/sink/dmlsink/mq/dispatcher/event_router.go:212-241)."""

    tables: tuple[TableRule, ...]
    partition: str = "default"  # default|table|ts|index-value|columns|rowid|key
    columns: tuple[str, ...] = ()
    topic: str | None = None  # template: [prefix]{schema}[mid][{table}][suffix]
    # named index for the index-value dispatcher (pkg/config/sink.go:389-390
    # DispatchRule.IndexName, TOML/JSON key "index"): hash the named index's
    # columns IN INDEX ORDER instead of the handle key. Must name an
    # EXISTING UNIQUE index on every matched table — verify_tables()
    # rejects at changefeed create otherwise (event_router.go:138-152).
    index_name: str | None = None


@dataclass
class TaskConfig:
    """The full pipeline spec — one of these is a 'changefeed'/'task'."""

    do_tables: tuple[TableRule, ...] = ()  # allow-list (empty = allow all)
    ignore_tables: tuple[TableRule, ...] = ()  # block-list
    case_sensitive: bool = False
    event_filters: tuple[EventFilterRule, ...] = ()
    sql_patterns: tuple[str, ...] = ()  # regexes; events whose note matches are skipped
    expr_filters: tuple[ExpressionFilterRule, ...] = ()
    ignore_txn_start_ts: tuple[int, ...] = ()
    routes: tuple[RouteRule, ...] = ()
    column_mappings: tuple[ColumnMapping, ...] = ()
    dispatchers: tuple[Dispatcher, ...] = ()
    safe_mode: bool = False
    compact: bool = True
    worker_count: int = 16  # causality partition count (dm dml_worker.go:34)
    checkpoint_ts: dict[str, int] = field(default_factory=dict)  # per-table low-watermark


def _rules(items) -> tuple[TableRule, ...]:
    return tuple(
        TableRule(r["schema"], r.get("table", "*")) if isinstance(r, dict)
        else TableRule(*r.split(".", 1)) if "." in r
        else TableRule(r)
        for r in items
    )


def from_dict(d: dict) -> TaskConfig:
    """Parse a task spec dict (the JSON/TOML shape users write — mirrors
    dm/config/subtask.go SubTaskConfig.Decode / cdc ReplicaConfig JSON).

    Table matchers accept "schema.table" strings or {"schema":..,"table":..}
    objects, wildcards included — the same surface as the reference's
    block-allow-list / route / filter rule sections.
    """
    return TaskConfig(
        do_tables=_rules(d.get("do_tables", ())),
        ignore_tables=_rules(d.get("ignore_tables", ())),
        case_sensitive=d.get("case_sensitive", False),
        event_filters=tuple(
            EventFilterRule(
                tables=_rules(f["tables"]),
                events=tuple(f["events"]),
                action=f.get("action", "Ignore"),
            )
            for f in d.get("event_filters", ())
        ),
        sql_patterns=tuple(d.get("sql_patterns", ())),
        expr_filters=tuple(
            ExpressionFilterRule(
                tables=_rules(f["tables"]),
                insert=f.get("insert"),
                update_old=f.get("update_old"),
                update_new=f.get("update_new"),
                delete=f.get("delete"),
            )
            for f in d.get("expr_filters", ())
        ),
        ignore_txn_start_ts=tuple(d.get("ignore_txn_start_ts", ())),
        routes=tuple(
            RouteRule(
                r["schema_pattern"],
                r["table_pattern"],
                r["target_schema"],
                r["target_table"],
                extract_schema_regexp=r.get("extract_schema_regexp"),
                extract_table_regexp=r.get("extract_table_regexp"),
            )
            for r in d.get("routes", ())
        ),
        column_mappings=tuple(
            ColumnMapping(
                tables=_rules(m["tables"]),
                column=m["column"],
                expr=m["expr"],
                arguments=tuple(m.get("arguments", ())),
            )
            for m in d.get("column_mappings", ())
        ),
        dispatchers=tuple(
            Dispatcher(
                tables=_rules(p["tables"]),
                partition=p.get("partition", "default"),
                columns=tuple(p.get("columns", ())),
                topic=p.get("topic"),
                index_name=p.get("index"),
            )
            for p in d.get("dispatchers", ())
        ),
        safe_mode=d.get("safe_mode", False),
        compact=d.get("compact", True),
        worker_count=d.get("worker_count", 16),
        checkpoint_ts=dict(d.get("checkpoint_ts", {})),
    )


def from_json(text: str) -> TaskConfig:
    import json

    return from_dict(json.loads(text))


# ------------------------------------------------------------- sink URIs

# scheme → sink kind (cdc/sink/validator; factory cdc/sink/dmlsink):
# mysql/tidb drive the txn MERGE apply, kafka/pulsar the MQ sink,
# file/s3/gcs/azure the cloud-storage sink.
SINK_SCHEMES: dict[str, str] = {
    "mysql": "mysql",
    "tidb": "mysql",
    "mysql+ssl": "mysql",
    "tidb+ssl": "mysql",
    "kafka": "mq",
    "kafka+ssl": "mq",
    "pulsar": "mq",
    "pulsar+ssl": "mq",
    "file": "storage",
    "s3": "storage",
    "gcs": "storage",
    "azblob": "storage",
    "blackhole": "blackhole",
}


@dataclass(frozen=True)
class SinkSpec:
    """Parsed sink URI (the `--sink-uri` surface of changefeed creation)."""

    uri: str
    scheme: str
    kind: str  # mysql | mq | storage | blackhole
    host: str | None = None
    port: int | None = None
    target: str | None = None  # topic (mq) / path (storage) / db (mysql)
    protocol: str | None = None  # codec for mq/storage sinks
    params: tuple[tuple[str, str], ...] = ()


def parse_sink_uri(uri: str) -> SinkSpec:
    """Parse a changefeed sink URI into a SinkSpec.

    Mirrors the reference's URI routing (cdc/sink/validator/validator.go,
    pkg/sink/sink_type): scheme picks the sink family, host:port the
    endpoint, first path segment the topic/database, query params the
    knobs (protocol, safe-mode, worker-count, ...).
    """
    import re
    from urllib.parse import parse_qsl, urlsplit

    m = re.match(r"^([a-z0-9+]+)://", uri)
    if not m:
        raise ValueError(f"sink uri has no scheme: {uri!r}")
    scheme = m.group(1)
    if scheme not in SINK_SCHEMES:
        raise ValueError(f"unsupported sink scheme: {scheme!r}")
    parts = urlsplit(uri)
    params = tuple(sorted(parse_qsl(parts.query)))
    target = parts.path.lstrip("/") or None
    protocol = dict(params).get("protocol")
    return SinkSpec(
        uri=uri,
        scheme=scheme,
        kind=SINK_SCHEMES[scheme],
        host=parts.hostname,
        port=parts.port,
        target=target,
        protocol=protocol,
        params=params,
    )


# Portable regexes (Java regex ∩ RE2) shared by the Spark operator and the
# DuckDB oracle so both engines *compute* the parse, not compare literals.
_URI_RE = {
    "scheme": r"^([a-z0-9+]+)://",
    "host": r"^[a-z0-9+]+://(?:[^/@?#]*@)?([^/:?#]*)",
    "port": r"^[a-z0-9+]+://(?:[^/@?#]*@)?[^/:?#]*:([0-9]+)",
    "target": r"^[a-z0-9+]+://[^/?#]*/([^?#]*)",
    "protocol": r"[?&]protocol=([^&#]*)",
}


def sink_uri_columns(df, uri_col: str = "uri"):
    """Columnar sink-URI parse: the DataFrame form of :func:`parse_sink_uri`
    (same fields, Spark built-ins only, codegen'd)."""
    from pyspark.sql import functions as F

    u = F.col(uri_col)

    def ext(name: str):
        return F.nullif(F.regexp_extract(u, _URI_RE[name], 1), F.lit(""))

    scheme = ext("scheme")
    kind = F.lit(None).cast("string")
    for s, k in reversed(sorted(SINK_SCHEMES.items())):
        kind = F.when(scheme == s, F.lit(k)).otherwise(kind)
    return df.select(
        u.alias("uri"),
        scheme.alias("scheme"),
        kind.alias("kind"),
        ext("host").alias("host"),
        ext("port").cast("int").alias("port"),
        ext("target").alias("target"),
        ext("protocol").alias("protocol"),
    )


def sink_uri_sql(uris_values: str) -> str:
    """DuckDB twin of :func:`sink_uri_columns` over a VALUES list."""
    def ext(name: str) -> str:
        pat = _URI_RE[name].replace("'", "''")
        return f"nullif(regexp_extract(uri, '{pat}', 1), '')"

    kind_case = " ".join(
        f"WHEN '{s}' THEN '{k}'" for s, k in sorted(SINK_SCHEMES.items())
    )
    return f"""WITH uris(uri) AS (VALUES {uris_values})
SELECT uri, {ext("scheme")} AS scheme,
  CASE {ext("scheme")} {kind_case} END AS kind,
  {ext("host")} AS host,
  CAST({ext("port")} AS INT) AS port,
  {ext("target")} AS target,
  {ext("protocol")} AS protocol
FROM uris"""
