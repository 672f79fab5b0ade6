"""Bucketed MERGE target — the shuffle-free apply path at scale.

The reference co-locates work by key once (causality hash → worker queue)
and then applies against MySQL, which resolves rows by index. Spark's
analog for a *table* target: bucket the target by the merge key, so every
incremental MERGE joins the (small) change batch against the (huge)
snapshot WITHOUT shuffling the snapshot — the scan is already hash-
partitioned by bucket. At 100 TB the snapshot shuffle is the single
largest avoidable cost in a merge; bucketing removes it from every batch
forever at the price of one bucketed write.

`tests/test_plan_contracts.py::test_bucketed_merge_does_not_shuffle_target`
asserts the property on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_target(
    snapshot: DataFrame,
    table_name: str,
    key_col: str = "id",
    n_buckets: int = 16,
) -> None:
    """One-time (re)materialization of the target, bucketed + sorted by the
    merge key (Delta/Iceberg deployments use their native clustering)."""
    (
        snapshot.write.mode("overwrite")
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def merge_against_bucketed(
    spark: SparkSession,
    table_name: str,
    changes: DataFrame,
    key_col: str = "id",
) -> DataFrame:
    """Incremental MERGE plan against the bucketed target: the change side
    shuffles into the target's bucket layout; the target side reads
    in-place. Net-delete keys drop, upserts win — same semantics as
    apply.merge_into_snapshot."""
    from pyspark.sql import functions as F

    target = spark.table(table_name)
    chg = changes.select(
        F.col("op").alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in target.columns],
    )
    joined = target.join(
        chg, target[key_col] == chg[f"_c_{key_col}"], "full_outer"
    )
    is_change = F.col("_op").isNotNull()
    keep = ~is_change | (F.col("_op") != "D")
    return joined.filter(keep).select(
        *[
            F.when(is_change, F.col(f"_c_{c}")).otherwise(F.col(c)).alias(c)
            for c in target.columns
        ]
    )
