"""Compactor — collapse multiple changes to the same key into one net change.

Reference: dm/syncer/compactor.go:28-230. Truth table (comments :154-162):
    I + U → I(new)      U + U → U(first.before, last.after)
    I + D → (nothing)   U + D → D      D + I → U (REPLACE-shaped)
Plus: updates that change the identity key must be split FIRST
(split_updates), so inside the compactor a key never migrates.

Spark-first shape: a single window over (target_table, key) ordered by
(commit_ts, seq) — `first` op + `last` image per key give the net change.
One shuffle on the same (table, key) hash the causality stage and the apply
stage reuse, so at scale the three stages share one exchange.

Event ordering rule (delete < update < insert at equal commit_ts,
cdc/model/sink.go:439-452) is encoded as op_weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def op_weight():
    """delete < update < insert at equal ts (cdc/model/sink.go:439-452)."""
    return F.when(F.col("op") == "D", 0).when(F.col("op") == "U", 1).otherwise(2)


def order_cols():
    return [F.col("commit_ts"), F.col("seq"), op_weight()]


def _order_key() -> F.Column:
    """Composite event-order key as a struct (lexicographic comparison) —
    unique per key since seq is unique."""
    return F.struct(F.col("commit_ts"), F.col("seq"), op_weight())


def compact(env: DataFrame, table_col: str = "table") -> DataFrame:
    """Net change per (table, key): first-op/last-op recombination.

    Returns one row per key with the same envelope columns; `op` is the net
    operation, before = first event's before, after = last event's after,
    commit_ts/start_ts/seq = the last event's (the net change is observed at
    the last change's timestamp, compactor.go:163).

    Shape: a hash aggregation with max_by/min_by over the composite order
    key — partial (map-side) combine, so the shuffle carries one row per
    key per map task instead of the whole stream, and no sort is needed.
    (The windowed form sorts every partition; at 100 TB the sort and the
    unsalvageable full-row shuffle dominate.)
    """
    ordk = _order_key()
    others = [c for c in env.columns if c not in (table_col, "key")]
    g = env.groupBy(table_col, "key").agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), ordk).alias("_last"),
        F.min_by(F.col("op"), ordk).alias("_first_op"),
        F.min_by(F.col("before"), ordk).alias("_first_before"),
    )
    flat = g.select(
        *[
            F.col(c) if c in (table_col, "key") else F.col(f"_last.{c}").alias(c)
            for c in env.columns
        ],
        "_first_op",
        "_first_before",
    )
    first_op, last_op = F.col("_first_op"), F.col("op")
    # net op truth table
    net_op = (
        F.when((first_op == "I") & (last_op == "D"), F.lit(None).cast("string"))
        .when(first_op == "I", F.lit("I"))
        .when((first_op == "D") & (last_op == "D"), F.lit("D"))
        .when(last_op == "D", F.lit("D"))
        .when(first_op == "D", F.lit("U"))  # D..I → REPLACE-shaped update
        .otherwise(F.lit("U"))
    )
    return (
        flat.withColumn("_net", net_op)
        .filter(F.col("_net").isNotNull())  # I..D annihilates
        .withColumn(
            "before",
            F.when(F.col("_net").isin("U", "D"), F.col("_first_before")),
        )
        .withColumn(
            "after",
            F.when(F.col("_net").isin("I", "U"), F.col("after")),
        )
        .withColumn("op", F.col("_net"))
        .drop("_net", "_first_op", "_first_before")
    )


def last_state_per_key(env: DataFrame, table_col: str = "table") -> DataFrame:
    """Just the final event per key (no truth-table recombination) — the
    dedup primitive used by the MERGE applier (max-ts-wins). Same
    map-side-combining max_by aggregation shape as compact()."""
    ordk = _order_key()
    others = [c for c in env.columns if c not in (table_col, "key")]
    g = env.groupBy(table_col, "key").agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), ordk).alias("_last")
    )
    return g.select(
        *[
            F.col(c) if c in (table_col, "key") else F.col(f"_last.{c}").alias(c)
            for c in env.columns
        ]
    )
