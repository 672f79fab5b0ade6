"""Versioned schema registry + as-of schema resolution (the mounter).

The reference decodes each raw KV event against the schema snapshot at its
CommitTs: cdc/entry/schema_storage.go:122-152 `getSnapshot` binary-searches
versioned snapshots; DDL jobs append versions (:191 HandleDDLJob); rows
written before an ADD COLUMN are backfilled with the column default
(cdc/entry/mounter.go:843-853 getDefaultOrZeroValue).

Spark-first shape:
- the registry is a tiny versioned table (table, version_ts, version_no,
  columns[...]) — broadcast everywhere
- as-of resolution = broadcast join on table + version_ts <= commit_ts,
  keep the max version (one window over the join, no custom code paths) —
  at 100 TB the event side never shuffles: broadcast + map-side window
  via aggregation-free max_by pattern. We use the join+row_number form for
  clarity; Catalyst broadcasts the registry side.
- default backfill = coalesce(field, default) per added column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def demo_registry(spark: SparkSession, boundaries: tuple[int, int]) -> DataFrame:
    """Three schema versions of the streamed table: v1 (id, balance),
    v2 adds note (default '{}'), v3 adds tier (default 'std').

    boundaries: the two commit_ts cutpoints between v1→v2 and v2→v3.
    """
    b1, b2 = boundaries
    rows = [
        ("events", 0, 1, ["id", "balance"], {}),
        ("events", b1, 2, ["id", "balance", "note"], {"note": "{}"}),
        ("events", b2, 3, ["id", "balance", "note", "tier"], {"note": "{}", "tier": "std"}),
    ]
    return spark.createDataFrame(
        rows, "table string, version_ts long, version_no int, columns array<string>, defaults map<string,string>"
    )



def asof_resolve(
    events: DataFrame,
    registry: DataFrame,
    event_table_col: str = "logical_table",
    unique_col: str = "seq",
) -> DataFrame:
    """Attach the schema version in effect at each event's commit_ts.

    Join on table + version_ts <= commit_ts, keep latest version — the
    declarative form of getSnapshot's binary search. Registry is broadcast;
    the (huge) event side keeps its partitioning. ``unique_col`` identifies
    an event for the keep-latest window.
    """
    r = registry.select(
        F.col("table").alias("_r_table"),
        "version_ts",
        "version_no",
        "columns",
        "defaults",
    )
    joined = events.join(
        F.broadcast(r),
        on=[
            events[event_table_col] == r["_r_table"],
            r["version_ts"] <= events["commit_ts"],
        ],
        how="left",
    ).drop("_r_table")
    w = Window.partitionBy(event_table_col, unique_col).orderBy(
        F.col("version_no").desc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "version_ts")
    )


def decode_with_schema(resolved: DataFrame) -> DataFrame:
    """Default-value backfill per resolved version: fields the version lacks
    are nulled; fields the version has but the row predates get defaults.

    Demo payload = the envelope's after image (id, balance, note) + virtual
    'tier' column introduced by v3.
    """
    has = F.array_contains
    cols = F.col("columns")
    return resolved.select(
        "*",
        F.when(has(cols, "note"), F.coalesce(F.col("after.note"), F.element_at("defaults", "note"))).alias(
            "note_resolved"
        ),
        F.when(has(cols, "tier"), F.coalesce(F.lit(None).cast("string"), F.element_at("defaults", "tier"))).alias(
            "tier_resolved"
        ),
    )
