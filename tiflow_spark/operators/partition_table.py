"""Partitioned-table routing: physical partition streams → logical table.

TiCDC captures partitioned tables one *physical* partition at a time —
every event carries a ``PhysicalTableID`` distinct from the logical table
(cdc/model/sink.go:347-391 ``PhysicalTableID``; spans are keyed by physical
id, cdc/processor/tablepb). Sinks must NOT expose partitions: the event
router dispatches on the *logical* schema/table
(cdc/sink/dmlsink/mq/dispatcher/event_router.go:32-262), so all partitions
of one table land in the same topic, and the index-value dispatcher keys on
(schema, logical table, handle key) so a row keeps its Kafka partition even
when a repartition DDL moves it between physical partitions
(tests/integration_tests/partition_table/).

Spark-first shape: the partition directory is metadata-sized (one row per
physical partition) → a broadcast map join; the merge itself is a column
rewrite, not a union of N streams — map-only, codegen'd, no shuffle. At
100 TB the change stream stays partitioned however the source delivered
it; only the *dispatch* columns downstream decide placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_partitions(
    env: DataFrame,
    partition_info: DataFrame,
    physical_col: str = "physical_table_id",
) -> DataFrame:
    """Rewrite (schema, table) of each event to the logical owner of its
    physical partition; keep the partition name as provenance metadata.

    ``partition_info``: one row per physical partition with columns
    (physical_table_id, logical_schema, logical_table, partition_name).
    Events whose physical id is absent from the directory are non-partitioned
    tables and pass through unchanged (left join + coalesce) — mirroring the
    reference, where only partitioned tables have PhysicalTableID ≠ TableID.
    """
    info = F.broadcast(
        partition_info.select(
            F.col("physical_table_id").alias(physical_col),
            F.col("logical_schema").alias("_lschema"),
            F.col("logical_table").alias("_ltable"),
            F.col("partition_name").alias("_pname"),
        )
    )
    routed = env.join(info, physical_col, "left")
    return routed.select(
        *[c for c in env.columns if c not in ("schema", "table")],
        F.coalesce(F.col("_lschema"), F.col("schema")).alias("schema"),
        F.coalesce(F.col("_ltable"), F.col("table")).alias("table"),
        F.col("_pname").alias("partition_name"),
    )


LONG_MIN = -(1 << 63)


def partition_directory_from_ddl(
    base_info: DataFrame,
    ddl: DataFrame,
    table_ids: dict[str, int] | None = None,
) -> DataFrame:
    """Fold partition DDL into a VERSIONED partition directory — the
    directory analog of ``registry_from_ddl``'s column fold.

    TiCDC reacts to partition DDL by re-deriving the physical→logical span
    map (ddl jobs add table partition / drop table partition / truncate
    table partition / exchange table partition pass ddlWhiteListMap,
    pkg/filter/filter.go:36-96; tests/integration_tests/partition_table/
    replays exactly this mid-stream). TiDB assigns fresh physical table ids
    on ADD and TRUNCATE PARTITION; here ids come from a deterministic
    counter starting at max(base ids)+1 (the sandbox substitute for TiDB's
    allocator — documented, oracle-stable).

    Semantics per kind:
      add:      new physical id joins the directory under (table, pname)
      drop:     the partition's physical id leaves (tombstone row)
      truncate: the partition gets a FRESH physical id; the old id leaves
      exchange: the standalone table's id (``table_ids[name]``) becomes the
                partition; the partition's old id leaves and is now the
                standalone table (absent from the directory = routed as-is)

    Output rows are per-physical-id DELTAS: (version_ts, physical_table_id,
    logical_schema, logical_table, partition_name), with NULL logical
    columns as the tombstone. Base rows carry version_ts = LONG_MIN.
    Metadata-scale fold (one row per partition DDL), same boundedness as
    the reference owner's schema storage.
    """
    from tiflow_spark.sources.ddl_parse import parse_ddl
    from tiflow_spark.sources.ddl_stream import ddl_allowlist_predicate

    spark = ddl.sparkSession
    table_ids = dict(table_ids or {})
    base = base_info.select(
        "physical_table_id", "logical_schema", "logical_table",
        "partition_name",
    ).collect()
    # live state: pname -> pid per (schema, table); pid -> mapping
    state: dict[tuple[str, str, str], int] = {}
    out: list[tuple] = []
    # Seed past BOTH partition ids and standalone-table ids: an
    # ADD/TRUNCATE PARTITION must never mint a pid that collides with a
    # table passed via table_ids (e.g. the EXCHANGE counterpart), or one
    # physical id would own two conflicting directory mappings.
    next_id = (
        max(
            max((r["physical_table_id"] for r in base), default=0),
            max(table_ids.values(), default=0),
        )
        + 1
    )
    for r in base:
        state[(r["logical_schema"], r["logical_table"], r["partition_name"])] = (
            r["physical_table_id"]
        )
        out.append(
            (
                LONG_MIN,
                r["physical_table_id"],
                r["logical_schema"],
                r["logical_table"],
                r["partition_name"],
            )
        )
    events = (
        ddl.filter(ddl_allowlist_predicate())
        .select("schema", "table", "commit_ts", "seq", "ddl_type", "query")
        .orderBy("commit_ts", "seq")
        .collect()
    )
    for ev in events:
        op = parse_ddl(ev.query)
        kind = op.kind if op is not None else ev.ddl_type
        if op is None or op.partition_name is None:
            continue
        lt = op.table or ev.table
        ls = op.schema or ev["schema"]
        slot = (ls, lt, op.partition_name)
        ts = ev.commit_ts
        if kind == "add table partition":
            if slot in state:
                continue
            state[slot] = next_id
            out.append((ts, next_id, ls, lt, op.partition_name))
            next_id += 1
        elif kind == "drop table partition":
            pid = state.pop(slot, None)
            if pid is not None:
                out.append((ts, pid, None, None, None))
        elif kind == "truncate table partition":
            old = state.pop(slot, None)
            if old is None:
                continue
            out.append((ts, old, None, None, None))
            state[slot] = next_id
            out.append((ts, next_id, ls, lt, op.partition_name))
            next_id += 1
        elif kind == "exchange table partition":
            old = state.pop(slot, None)
            incoming = table_ids.get(op.exchange_table)
            if old is None or incoming is None:
                continue
            out.append((ts, old, None, None, None))  # now the standalone
            state[slot] = incoming
            out.append((ts, incoming, ls, lt, op.partition_name))
            table_ids[op.exchange_table] = old
    return spark.createDataFrame(
        out,
        "version_ts long, physical_table_id long, logical_schema string, "
        "logical_table string, partition_name string",
    )


def route_partitions_asof(
    env: DataFrame,
    pdir_versions: DataFrame,
    physical_col: str = "physical_table_id",
) -> DataFrame:
    """:func:`route_partitions` against a VERSIONED directory: each event
    resolves its physical id's mapping as-of its commit_ts, so a
    repartition DDL mid-stream reroutes subsequent events while earlier
    ones keep their original logical owner (the partition_table
    integration-test property).

    Same shape as ``schema_registry.asof_resolve``: per-physical-id version
    arrays (metadata-scale) broadcast against the event side — equi-join +
    map-only pick, the event stream never shuffles or multiplies. Tombstone
    versions (NULL logical columns) make a dropped/exchanged-away id fall
    back to the event's own (schema, table).
    """
    packed = pdir_versions.groupBy("physical_table_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "version_ts",
                    "logical_schema",
                    "logical_table",
                    "partition_name",
                )
            )
        ).alias("_pvers")
    ).withColumnRenamed("physical_table_id", "_pid")
    applicable = F.filter(
        F.col("_pvers"), lambda v: v["version_ts"] <= F.col("commit_ts")
    )
    pick = F.get(applicable, F.size(applicable) - 1)
    routed = env.join(
        F.broadcast(packed),
        on=env[physical_col] == packed["_pid"],
        how="left",
    ).withColumn("_pv", pick)
    return routed.select(
        *[c for c in env.columns if c not in ("schema", "table")],
        F.coalesce(F.col("_pv.logical_schema"), F.col("schema")).alias(
            "schema"
        ),
        F.coalesce(F.col("_pv.logical_table"), F.col("table")).alias("table"),
        F.col("_pv.partition_name").alias("partition_name"),
    )
