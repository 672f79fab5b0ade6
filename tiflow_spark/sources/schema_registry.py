"""Versioned schema registry + as-of schema resolution (the mounter).

The reference decodes each raw KV event against the schema snapshot at its
CommitTs: cdc/entry/schema_storage.go:122-152 `getSnapshot` binary-searches
versioned snapshots; DDL jobs append versions (:191 HandleDDLJob); rows
written before an ADD COLUMN are backfilled with the column default
(cdc/entry/mounter.go:843-853 getDefaultOrZeroValue).

Spark-first shape:
- the registry is a tiny versioned table (table, version_ts, version_no,
  columns[...]) — broadcast everywhere
- as-of resolution = broadcast the per-table sorted version arrays and pick
  the applicable version with array functions — equi-join + map-only, the
  event side never shuffles or multiplies.
- default backfill = coalesce(field, default) per added column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_resolve(
    events: DataFrame,
    registry: DataFrame,
    event_table_col: str = "logical_table",
    unique_col: str = "seq",
    with_keys: bool = False,
    with_types: bool = False,
) -> DataFrame:
    """Attach the schema version in effect at each event's commit_ts.

    The declarative form of getSnapshot's binary search: each table's (tiny)
    version history is packed into one version_ts-sorted array, broadcast,
    and the event picks the last version with version_ts <= commit_ts with
    array functions — an equi-broadcast-join plus a map-only projection.
    The (huge) event side never shuffles and never multiplies: the earlier
    join-on-inequality + keep-latest-window form expanded every event by
    its version count and shuffled the expansion on (table, ``unique_col``),
    which at 100 TB is the dominant cost of decode. Version arrays are
    O(DDL count per table) — metadata-scale by construction.
    """
    fields = ["version_ts", "version_no", "columns", "defaults"]
    # version_ts always rides along: decode needs it for the
    # CURRENT_TIMESTAMP default stand-in (see decode_with_schema)
    if with_keys:
        # key metadata rides the same broadcast version array — as-of
        # handle-key resolution costs nothing extra (ColumnFlagType
        # propagation, cdc/model/sink.go:62-205)
        fields += ["pk_cols", "handle_cols"]
    if with_types:
        fields += ["types"]
    packed = registry.groupBy("table").agg(
        F.array_sort(
            F.collect_list(F.struct(*fields)),
            # explicit comparator: sort_array can't order map-bearing structs
            lambda a, b: F.when(a["version_ts"] < b["version_ts"], -1)
            .when(a["version_ts"] > b["version_ts"], 1)
            .otherwise(0),
        ).alias("_versions")
    ).withColumnRenamed("table", "_r_table")
    applicable = F.filter(
        F.col("_versions"), lambda v: v["version_ts"] <= F.col("commit_ts")
    )
    # F.get: NULL (not an ANSI error) for no applicable version / no table
    pick = F.get(applicable, F.size(applicable) - 1)
    return (
        events.join(
            F.broadcast(packed),
            on=events[event_table_col] == packed["_r_table"],
            how="left",
        )
        .withColumn("_v", pick)
        .select(
            *events.columns,
            F.col("_v.version_no").alias("version_no"),
            F.col("_v.version_ts").alias("version_ts"),
            F.col("_v.columns").alias("columns"),
            F.col("_v.defaults").alias("defaults"),
            *(
                [
                    F.col("_v.pk_cols").alias("pk_cols"),
                    F.col("_v.handle_cols").alias("handle_cols"),
                ]
                if with_keys
                else []
            ),
            *([F.col("_v.types").alias("types")] if with_types else []),
        )
    )


def _spark_cast(sql_type: str) -> str:
    """MySQL/ANSI column type → Spark cast target (the subset replication
    streams carry; unknowns decode as string, the codecs' wire default)."""
    head = sql_type.split("(")[0].strip().upper()
    if head in ("DECIMAL", "NUMERIC"):
        return sql_type.lower() if "(" in sql_type else "decimal(10,0)"
    return {
        "BIGINT": "long", "INT": "int", "INTEGER": "int", "MEDIUMINT": "int",
        "SMALLINT": "smallint", "TINYINT": "tinyint",
        "DOUBLE": "double", "REAL": "double", "FLOAT": "float",
        "BOOLEAN": "boolean", "BOOL": "boolean",
        "DATE": "date", "DATETIME": "timestamp_ntz",
        "TIMESTAMP": "timestamp_ntz",
        "BINARY": "binary", "VARBINARY": "binary", "BLOB": "binary",
    }.get(head, "string")


def registry_column_plan(
    registry: DataFrame,
) -> list[tuple[str, str]]:
    """Driver-side extraction of the registry's column universe: every
    column any version ever had, in first-introduced order, with its LATEST
    declared SQL type. The registry is metadata-scale (the reference keeps
    all of it in the owner's memory), so this collect is bounded the same
    way."""
    # read the fold's driver-side rows when the registry frame carries
    # them (registry_from_ddl annotation) — skips a ~0.25 s fixed-cost
    # collect job for rows the driver already holds (r14)
    local = getattr(registry, "_tiflow_registry_rows", None)
    rows = sorted(
        local
        if local is not None
        else registry.select(
            "table", "version_no", "columns", "types"
        ).collect(),
        key=lambda r: (r.table, r.version_no),
    )
    ordered: list[str] = []
    types: dict[str, str] = {}
    for r in rows:
        for c in r.columns:
            if c not in types:
                ordered.append(c)
            types[c] = (r.types or {}).get(c, "VARCHAR")
    return [(c, types[c]) for c in ordered]


def decode_with_schema(
    resolved: DataFrame,
    registry: DataFrame,
    payload_col: str = "after",
) -> DataFrame:
    """Default-value backfill per resolved version — fully derived from the
    registry (no per-deployment column names in engine code): for every
    column the registry ever defined, emit ``<col>_resolved`` =

    - NULL when the row's resolved version lacks the column,
    - the payload field (cast to the declared type) when present,
    - else the version's declared DEFAULT (mounter.go:843-853
      getDefaultOrZeroValue).

    ``DEFAULT CURRENT_TIMESTAMP`` (the ddl_default_current_timestamp
    scenario) backfills with the resolved version's OWN commit time
    (timestamp_micros(version_ts)) — the deterministic stand-in for the
    reference's evaluate-at-decode clock read, which would make replays
    non-idempotent; the DDL's commit time is the latest instant the
    missing value could have been written.
    """
    payload_fields = {
        f.name for f in resolved.schema[payload_col].dataType.fields
    }
    out = [F.col("*")]
    for c, sql_type in registry_column_plan(registry):
        t = _spark_cast(sql_type)
        src = (
            F.col(f"{payload_col}.{c}").cast(t)
            if c in payload_fields
            else F.lit(None).cast(t)
        )
        dflt = F.element_at("defaults", F.lit(c))
        if t in ("timestamp_ntz", "timestamp"):
            dflt_val = F.when(
                F.upper(dflt).isin("CURRENT_TIMESTAMP", "NOW()"),
                F.timestamp_micros(F.col("version_ts")).cast(t),
            ).otherwise(dflt.cast(t))
        else:
            dflt_val = dflt.cast(t)
        out.append(
            F.when(
                F.array_contains(F.col("columns"), c),
                F.coalesce(src, dflt_val),
            ).alias(f"{c}_resolved")
        )
    return resolved.select(*out)
