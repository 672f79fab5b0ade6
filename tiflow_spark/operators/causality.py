"""Causality — key-hash partitioning for conflict-free parallel apply.

The reference hashes each DML's PK/UK values to "causality keys" and pins
conflicting transactions to the same worker queue (dm/syncer/causality.go:
47-170, pkg/sqlmodel/causality.go:34-258; TiCDC's generic variant
pkg/causality/conflict_detector.go:31-140).

In Spark the whole mechanism collapses into a hash repartition: the shuffle
guarantees all events of one causality key land in the same partition, and
sortWithinPartitions restores per-key order. Multi-UK rows (which force the
reference to inject conflict barriers) are handled by deriving ONE canonical
causality key per row — the handle key — and documenting the relaxation for
cross-key transactions (same relaxation tiflow's MQ/storage sinks accept,
cdc/model/sink.go:1187).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.operators.compactor import order_cols


def causality_key(
    table_col: str = "table", extra_key_cols: tuple[str, ...] = ()
) -> Column:
    """Canonical causality key: table ⊕ handle key (+ optional UK columns,
    mirroring pkg/sqlmodel/causality.go's key = values + column names + table)."""
    parts = [F.col(table_col), F.col("key"), *[F.col(c) for c in extra_key_cols]]
    return F.concat_ws("\x01", *parts)


def partition_by_causality(
    env: DataFrame,
    num_partitions: int,
    table_col: str = "table",
) -> DataFrame:
    """Repartition by causality key and restore per-key event order.

    At scale this is THE apply-side shuffle; compact/apply run on its output
    without further exchanges. Skewed keys are handled by AQE skew-join /
    the partition count, not by barriers as in the reference.
    """
    return env.repartition(
        num_partitions, causality_key(table_col)
    ).sortWithinPartitions(table_col, "key", *order_cols())


def causality_partition_id(
    num_partitions: int, table_col: str = "table"
) -> Column:
    """Deterministic worker-queue id for a row (oracle-checkable variant of
    the shuffle assignment): portable md5-based hash, mod worker count."""
    from tiflow_spark.functions.hashing import portable_hash64

    return F.pmod(portable_hash64(causality_key(table_col)), F.lit(num_partitions))
