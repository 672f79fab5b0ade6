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
