"""DDL event side-channel — the reference's DDL puller + schema evolution.

The reference runs a dedicated DDL stream next to the row-change stream
(cdc/puller/ddl_puller.go): DDL jobs pass an allow-list
(pkg/filter/filter.go:36-96 ddlWhiteListMap), user binlog-filter rules drop
per-DDL-kind events (pkg/binlog-filter/filter.go:36-96 taxonomy), and
surviving jobs advance the versioned schema storage
(cdc/entry/schema_storage.go:191 HandleDDLJob) and execute downstream at the
barrier (cdc/owner/ddl_manager.go:508).

Spark-first shape: the DDL stream is a tiny DataFrame (broadcast everywhere),
filters are boolean Columns, and HandleDDLJob is a window over the stream
building cumulative (columns, defaults) per version — the registry that
`schema_registry.asof_resolve` broadcasts against the huge event side.

For tests/oracles the stream is synthesized deterministically: DDL commit
timestamps are fixed twelfths of the events table's [min, max] commit-ts
range, so the identical stream is constructible in DuckDB
(:data:`DDL_SQL_DUCKDB`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# The DDL kinds cdc's schema storage accepts (pkg/filter/filter.go:36-96
# ddlWhiteListMap values, named per pkg/binlog-filter/filter.go taxonomy).
DDL_ALLOWLIST = frozenset(
    {
        "create database", "drop database", "modify schema charset and collate",
        "create table", "drop table", "truncate table", "rename table",
        "recover table", "modify table comment",
        "modify table charset and collate",
        "create view", "drop view",
        "add table partition", "drop table partition",
        "truncate table partition", "exchange table partition",
        "reorganize table partition", "alter table partitioning",
        "remove table partitioning",
        "add column", "drop column", "modify column", "set default value",
        "rebase auto id", "add primary key", "drop primary key",
        "create index", "drop index", "rename index",
        "alter index visibility", "alter ttl info", "alter ttl remove",
        "multi schema change", "add foreign key", "drop foreign key",
    }
)

# (seq, pos12, schema, table, ddl_type, query, add_column, default_value)
# pos12 = commit position in twelfths of the event-stream time range.
# 'analyze table' and 'create sequence' are intentionally NOT whitelisted —
# they exercise the allow-list drop path (the reference silently discards
# non-whitelisted ActionTypes before schema storage).
_TEMPLATES = [
    (1, 0, "shard_0", "events", "create table",
     "CREATE TABLE events (id BIGINT PRIMARY KEY, balance DOUBLE)", None, None),
    (2, 1, "shard_0", "scratch", "create table",
     "CREATE TABLE scratch (id BIGINT)", None, None),
    (3, 2, "shard_0", "events", "create index",
     "CREATE INDEX idx_balance ON events (balance)", None, None),
    (4, 3, "shard_0", "events", "analyze table",
     "ANALYZE TABLE events", None, None),
    (5, 4, "shard_0", "events", "add column",
     "ALTER TABLE events ADD COLUMN note VARCHAR DEFAULT '{}'", "note", "{}"),
    (6, 5, "shard_0", "scratch", "truncate table",
     "TRUNCATE TABLE scratch", None, None),
    (7, 6, "shard_0", "scratch", "drop table",
     "DROP TABLE scratch", None, None),
    (8, 7, "shard_0", "events", "create view",
     "CREATE VIEW v_events AS SELECT id FROM events", None, None),
    (9, 8, "shard_0", "events", "add column",
     "ALTER TABLE events ADD COLUMN tier VARCHAR DEFAULT 'std'", "tier", "std"),
    (10, 9, "shard_0", "events", "drop index",
     "DROP INDEX idx_balance ON events", None, None),
    (11, 10, "shard_0", "events", "create sequence",
     "CREATE SEQUENCE seq_events", None, None),
    (12, 11, "shard_0", "events_tmp", "rename table",
     "RENAME TABLE events_tmp TO events_new", None, None),
]

_TEMPLATE_SCHEMA = (
    "seq long, pos12 long, schema string, table string, ddl_type string, "
    "query string, add_column string, default_value string"
)


def ddl_stream(events: DataFrame) -> DataFrame:
    """Synthesize the DDL side-channel from the events table's time range.

    One aggregate row (min/max commit-ts) cross-joined against the 12-row
    template literal — the event side is scanned once with map-side combine;
    the result is 12 rows, broadcastable everywhere downstream.
    """
    spark = events.sparkSession
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    templates = spark.createDataFrame(_TEMPLATES, _TEMPLATE_SCHEMA)
    return bounds.crossJoin(F.broadcast(templates)).select(
        F.lit("DDL").alias("op"),
        "schema",
        "table",
        (F.col("t0") + F.expr("(t1 - t0) * pos12 div 12")).alias("commit_ts"),
        "seq",
        "ddl_type",
        "query",
        "add_column",
        "default_value",
    )


def _values_sql() -> str:
    def lit(v):
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        if isinstance(v, int):
            return str(v)
        return "'" + v.replace("'", "''") + "'"

    rows = ",\n    ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in _TEMPLATES
    )
    return rows


# DuckDB CTE producing the SAME 12 rows (keep in lockstep with ddl_stream()).
DDL_SQL_DUCKDB = f"""
ddl_bounds AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
),
ddl AS (
  SELECT 'DDL' AS op, v.schema_name AS "schema", v.table_name AS "table",
         t0 + (t1 - t0) * v.pos12 // 12 AS commit_ts,
         v.seq, v.ddl_type, v.query, v.add_column, v.default_value
  FROM ddl_bounds CROSS JOIN (VALUES
    {_values_sql()}
  ) AS v(seq, pos12, schema_name, table_name, ddl_type, query, add_column,
         default_value)
)"""


def ddl_allowlist_predicate() -> F.Column:
    """Keep-predicate of the schema-storage allow-list (ddlWhiteListMap):
    non-whitelisted DDL kinds never reach schema storage or sinks."""
    return F.col("ddl_type").isin(*sorted(DDL_ALLOWLIST))


def ddl_filter_predicate(cfg) -> F.Column:
    """Per-DDL-kind binlog-filter rules (pkg/binlog-filter/filter.go:36-96):
    an EventFilterRule whose ``events`` name DDL kinds (e.g. 'truncate
    table') drops matching kinds for matching tables; 'all ddl' drops every
    kind. Reuses the same rule objects as the DML event filter."""
    from tiflow_spark.operators.filters import any_table_matches

    keep = F.lit(True)
    for rule in cfg.event_filters:
        kinds = [e for e in rule.events if e not in ("I", "U", "D")]
        if not kinds:
            continue
        matched = any_table_matches(rule.tables, cfg.case_sensitive)
        hit = F.col("ddl_type").isin(*kinds) | F.lit("all ddl" in kinds)
        if rule.action == "Ignore":
            keep = keep & ~(matched & hit)
        else:  # Do
            keep = keep & (~matched | hit)
    return keep


# Base columns of tables at their bootstrap CREATE TABLE (the reference
# parses these from the DDL job's TableInfo; we key them by table name).
_BASE_COLUMNS = {"events": ("id", "balance"), "scratch": ("id",)}


def registry_from_ddl(
    ddl: DataFrame, base_columns: dict[str, tuple[str, ...]] | None = None
) -> DataFrame:
    """HandleDDLJob analog (cdc/entry/schema_storage.go:122-191): fold the
    DDL stream into versioned schema rows (table, version_ts, version_no,
    columns, defaults) — the registry `asof_resolve` broadcasts.

    A cumulative window over (create table | add column) DDLs per table:
    version_no = position, columns = base ∪ adds so far, defaults = the
    ADD COLUMN defaults so far (mounter.go:843-853 backfill source).
    """
    base_columns = base_columns or _BASE_COLUMNS
    base_map = F.create_map(
        *[
            x
            for name, cols in sorted(base_columns.items())
            for x in (F.lit(name), F.array(*[F.lit(c) for c in cols]))
        ]
    )
    rows = ddl.filter(
        ddl_allowlist_predicate()
        & F.col("ddl_type").isin("create table", "add column")
    ).select(
        "table",
        F.col("commit_ts").alias("version_ts"),
        "seq",
        F.when(
            F.col("ddl_type") == "create table",
            F.coalesce(base_map[F.col("table")], F.array().cast("array<string>")),
        )
        .otherwise(F.array(F.col("add_column")))
        .alias("_adds"),
        F.when(
            F.col("add_column").isNotNull(),
            F.struct(
                F.col("add_column").alias("key"),
                F.col("default_value").alias("value"),
            ),
        ).alias("_def"),
    )
    w = Window.partitionBy("table").orderBy("version_ts", "seq")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        rows.withColumn("version_no", F.row_number().over(w))
        .withColumn("columns", F.flatten(F.collect_list("_adds").over(wc)))
        .withColumn("_defs", F.collect_list("_def").over(wc))
        .withColumn(
            "defaults",
            F.map_from_entries(
                F.when(F.size("_defs") > 0, F.col("_defs")).otherwise(
                    F.array().cast("array<struct<key:string,value:string>>")
                )
            ),
        )
        .select("table", "version_ts", "version_no", "columns", "defaults",
                "_defs")
    )


# ------------------------------------------------- optimistic shard-DDL mode

# (shard, pos12, ddl_type, table, col_name, col_type): each shard applies
# DDL independently at its own pace (dm/pkg/shardddl/optimism). shard_2
# never applies ADD COLUMN note (lagging member); `scratch.flag` is added
# with DIFFERENT types by the two shards (the lattice-incompatible case
# tidb schemacmp flags as a conflict).
_OPT_TEMPLATES = [
    ("shard_0", 0, "create table", "events", "id", "bigint"),
    ("shard_0", 0, "create table", "events", "balance", "double"),
    ("shard_1", 0, "create table", "events", "id", "bigint"),
    ("shard_1", 0, "create table", "events", "balance", "double"),
    ("shard_2", 0, "create table", "events", "id", "bigint"),
    ("shard_2", 0, "create table", "events", "balance", "double"),
    ("shard_0", 4, "add column", "events", "note", "varchar"),
    ("shard_1", 6, "add column", "events", "note", "varchar"),
    ("shard_0", 8, "add column", "events", "tier", "varchar"),
    ("shard_1", 10, "add column", "events", "tier", "varchar"),
    ("shard_2", 11, "add column", "events", "tier", "varchar"),
    ("shard_0", 5, "add column", "scratch", "flag", "varchar"),
    ("shard_1", 7, "add column", "scratch", "flag", "int"),
]


def optimistic_shard_ddl(events: DataFrame) -> DataFrame:
    """Per-shard DDL application stream for optimistic mode: shards run the
    same logical migration at independent times (dm/syncer/shardddl/
    optimist.go); commit timestamps derive from the event-stream range like
    ddl_stream()."""
    spark = events.sparkSession
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    tpl = spark.createDataFrame(
        _OPT_TEMPLATES,
        "shard string, pos12 long, ddl_type string, table string, "
        "col_name string, col_type string",
    )
    return bounds.crossJoin(F.broadcast(tpl)).select(
        "shard",
        "table",
        (F.col("t0") + F.expr("(t1 - t0) * pos12 div 12")).alias("commit_ts"),
        "ddl_type",
        "col_name",
        "col_type",
    )


def _opt_values_sql() -> str:
    rows = ",\n    ".join(
        "('%s', %d, '%s', '%s', '%s', '%s')" % r for r in _OPT_TEMPLATES
    )
    return rows


OPTIMISTIC_DDL_SQL_DUCKDB = f"""
opt_bounds AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
),
opt_ddl AS (
  SELECT v.shard, v.table_name AS "table",
         t0 + (t1 - t0) * v.pos12 // 12 AS commit_ts,
         v.ddl_type, v.col_name, v.col_type
  FROM opt_bounds CROSS JOIN (VALUES
    {_opt_values_sql()}
  ) AS v(shard, pos12, ddl_type, table_name, col_name, col_type)
)"""
