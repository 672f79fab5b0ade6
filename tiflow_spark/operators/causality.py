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
    num_partitions: int,
    table_col: str = "table",
    key: Column | None = None,
) -> Column:
    """Deterministic worker-queue id for a row (oracle-checkable variant of
    the shuffle assignment): portable md5-based hash, mod worker count."""
    from tiflow_spark.functions.hashing import portable_hash64

    k = key if key is not None else causality_key(table_col)
    return F.pmod(portable_hash64(k), F.lit(num_partitions))


# ------------------------------------------------------------- FK causality

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class FKRelation:
    """One foreign-key causality relation, POST-lifting — mirror of
    ForeignKeyCausalityRelation (pkg/sqlmodel/foreign_key.go:26-33):
    ``parent_table`` "may represent a direct parent or a higher-level
    ancestor/root parent", i.e. chains are resolved to the root key domain
    at config-compile time, exactly as the reference stores them.

    fk_expr: SQL expression over the row images producing the child's FK
    value (e.g. ``coalesce(after.parent_id, before.parent_id)``).
    """

    child_table: str
    fk_expr: str
    parent_table: str


def fk_causality_key(
    relations: tuple[FKRelation, ...] = (),
    table_col: str = "table",
) -> Column:
    """Causality key with FK lifting (pkg/sqlmodel/causality.go:160-204
    getForeignKeyCausalityString): a child row keys into its ROOT parent's
    key domain (parent_table ⊕ fk value), so parent and child rows that
    touch the same parent key share a partition — and therefore apply in
    commit order. NULL FK values fall back to the row's own key, the
    reference's skip rule (causality.go:176-189)."""
    key = causality_key(table_col)
    for rel in relations:
        fk_val = F.expr(rel.fk_expr)
        key = F.when(
            (F.col(table_col) == rel.child_table) & fk_val.isNotNull(),
            F.concat_ws(
                "\x01", F.lit(rel.parent_table), fk_val.cast("string")
            ),
        ).otherwise(key)
    return key


def partition_by_fk_causality(
    env: DataFrame,
    num_partitions: int,
    relations: tuple[FKRelation, ...],
    table_col: str = "table",
) -> DataFrame:
    """Repartition by the FK-lifted causality key + restore event order —
    same single-shuffle shape as partition_by_causality, with FK-linked
    tables co-located.

    Sort is by the LIFTED key then commit order, NOT table-first: parent and
    child rows sharing a root-parent key domain must interleave in commit
    order (the guarantee FK lifting exists to provide — the reference's
    worker queue applies its events strictly by commit ts across tables)."""
    return env.repartition(
        num_partitions, fk_causality_key(relations, table_col)
    ).sortWithinPartitions(fk_causality_key(relations, table_col), *order_cols())
