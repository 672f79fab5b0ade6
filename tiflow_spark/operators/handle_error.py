"""Handle-error — dead-letter queue + user skip/replace patches.

Reference: dm/syncer/handle_error.go (dmctl binlog skip/replace: when an
event repeatedly fails downstream, the operator injects a resolution — drop
it or substitute corrected SQL) and the errorRowDelay/error-row bookkeeping
in the validator.

Spark shape: "failing" rows split into a DLQ DataFrame (in production a
parquet/Delta side table); resolutions arrive as a small patch table
broadcast-joined back onto the DLQ; repaired rows re-enter the stream.
No driver loops — the patch join is one broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_dead_letter(
    env: DataFrame, poison: Column
) -> tuple[DataFrame, DataFrame]:
    """Stream → (healthy rows, dead-lettered rows). `poison` models the
    downstream failure predicate (in production: the retry-exhausted set)."""
    return env.filter(~poison), env.filter(poison)


def apply_patches(
    dlq: DataFrame,
    patches: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Resolve dead-lettered rows with user patches (handle_error.go
    skip/replace):

    patches: (key, action 'skip'|'replace', new_balance) — 'skip' drops the
    event (binlog skip), 'replace' substitutes the corrected after-image
    (binlog replace). Unpatched DLQ rows stay parked (returned by caller's
    next cycle); patched-replace rows are the repaired re-injection."""
    p = F.broadcast(
        patches.select(
            F.col(key_col).alias("_p_key"),
            F.col("action").alias("_p_action"),
            F.col("new_balance").alias("_p_balance"),
        )
    )
    joined = dlq.join(p, dlq[key_col] == p["_p_key"], "inner")
    repaired = joined.filter(F.col("_p_action") == "replace").withColumn(
        "after",
        F.struct(
            F.col("after.id").alias("id"),
            F.col("_p_balance").alias("balance"),
            F.col("after.note").alias("note"),
        ),
    )
    return repaired.drop("_p_key", "_p_action", "_p_balance")


def resolve_stream(
    env: DataFrame,
    poison: Column,
    patches: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Healthy rows + repaired re-injections — the post-resolution stream."""
    good, dlq = split_dead_letter(env, poison)
    return good.unionByName(apply_patches(dlq, patches, key_col))
