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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def merge_hash_bucketed(
    changes: DataFrame,
    path: str,
    n_buckets: int = 32,
    key_cols: tuple[str, ...] = ("target_table", "key"),
    table_col: str = "target_table",
    batch_id: int = 0,
) -> None:
    """Streaming MERGE with per-batch cost O(batch + touched buckets), not
    O(target): the target is a parquet directory hash-partitioned on
    ``bucket = pmod(xxhash64(key), n_buckets)``. Each batch

    1. computes the buckets its keys touch (a tiny distinct on the batch),
    2. reads ONLY those partitions (partition-pruned scan),
    3. re-resolves max-(commit_ts, seq, op)-wins per key, and
    4. dynamic-partition-overwrites only the touched buckets.

    Untouched buckets are never read or written — the property that makes a
    standing changefeed viable when the target is 1000x the batch. This is
    the parquet-native analog of Delta/Iceberg MERGE INTO (which remains
    the production seam of foreachBatch); the reference's MySQL sink gets
    the same effect from index lookups (cdc/sink/dmlsink/txn/mysql).

    Sizing: n_buckets should scale with target size so one bucket ~ a few
    hundred MB (100 TB target / 256 MB ≈ 400k buckets); replaying a batch
    re-merges the same winners — idempotent, same contract as the
    reference's safe-mode REPLACE.
    """
    from tiflow_spark.operators.compactor import last_state_per_key

    spark = changes.sparkSession
    chg = changes.withColumn(
        "bucket",
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast(
            "int"
        ),
    ).persist()
    try:
        if not os.path.exists(path):
            # D winners are RETAINED as tombstones: without them, a
            # late-arriving event OLDER than an applied delete would
            # resurrect the row (the reference never sees this — its sorter
            # + resolved-ts contract delivers per-key in order; a file
            # source across restarts does not). read_state() filters them;
            # purge_tombstones() reclaims them below the GC safepoint.
            result = last_state_per_key(chg, table_col)
            # one file per bucket dir: without this, every writer task sprays
            # a small file into every bucket it sees (32 tasks x 1024 dirs)
            result.repartition(F.col("bucket")).write.mode(
                "overwrite"
            ).partitionBy("bucket").parquet(path)
            return
        affected = sorted(
            r.bucket for r in chg.select("bucket").distinct().collect()
        )
        # list ONLY the touched bucket dirs (basePath keeps the partition
        # column) — full-tree partition discovery is O(n_buckets) listing
        # per batch, the metadata analog of the full-table scan. (Delta/
        # Iceberg get this from the transaction log; plain parquet gets it
        # from the explicit dir list.)
        existing = [
            p
            for b in affected
            if os.path.isdir(p := os.path.join(path, f"bucket={b}"))
        ]
        if existing:
            # stored rows keep their op (D rows are tombstones and must keep
            # outranking older late arrivals)
            current = (
                spark.read.schema(chg.schema)
                .option("basePath", path)
                .parquet(*existing)
            )
            src = current.unionByName(chg, allowMissingColumns=True)
        else:
            src = chg
        winner = last_state_per_key(
            src.withColumn("seq", F.coalesce(F.col("seq"), F.lit(-1)))
            .withColumn("commit_ts", F.coalesce(F.col("commit_ts"), F.lit(-1))),
            table_col,
        )
        result = winner  # tombstones retained (see above)
        # stage to a tmp dir (the plan reads the same path it overwrites),
        # then commit by directory rename — the classic staged-commit: no
        # second Spark job, and a bucket whose rows were ALL deleted simply
        # has no staged dir and gets removed. (Delta/Iceberg MERGE INTO is
        # the production seam; this is the parquet-native incarnation.)
        tmp = f"{path}.tmp-{batch_id}"
        result.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(tmp)
        staged = {d for d in os.listdir(tmp) if d.startswith("bucket=")}
        for b in affected:
            shutil.rmtree(os.path.join(path, f"bucket={b}"), ignore_errors=True)
        for d in staged:
            os.rename(os.path.join(tmp, d), os.path.join(path, d))
        shutil.rmtree(tmp, ignore_errors=True)
    finally:
        chg.unpersist()


def read_state(spark: SparkSession, path: str) -> DataFrame:
    """Live rows of a hash-bucket target: tombstones filtered out. This is
    the downstream-visible table state."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return df.filter(F.col("op") != "D")


def purge_tombstones(
    spark: SparkSession, path: str, safepoint_ts: int
) -> None:
    """Reclaim tombstones with commit_ts <= safepoint_ts (the GC-safepoint
    analog, pkg/txnutil/gc): once the source guarantees no event at-or-below
    the safepoint will ever arrive (resolved-ts contract), deletes below it
    can never be outranked and are physically dropped. Full-target rewrite —
    run at maintenance cadence, not per batch."""
    df = spark.read.parquet(path)
    kept = df.filter(
        ~((F.col("op") == "D") & (F.col("commit_ts") <= F.lit(safepoint_ts)))
    )
    tmp = f"{path}.purge"
    kept.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(tmp)
    for d in os.listdir(path):
        if d.startswith("bucket="):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    for d in os.listdir(tmp):
        if d.startswith("bucket="):
            os.rename(os.path.join(tmp, d), os.path.join(path, d))
    shutil.rmtree(tmp, ignore_errors=True)
