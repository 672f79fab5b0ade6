"""Task prechecks — DM's checker suite re-expressed as metadata/data queries.

Reference: dm/checker/checker.go:84-731 and dm/pkg/checker/
(table_structure.go: PK/UK existence + shard-schema consistency,
case sensitivity; privilege/binlog checks are connection-level and out of
scope for a file-based engine).

Each check returns rows (check_name, target_table, passed, detail_cnt) so
the whole precheck is one small DataFrame union the driver can assert on
before starting a pipeline. All checks are single-pass aggregations over
the (routed) change stream — no driver loops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_pk_not_null(routed: DataFrame) -> DataFrame:
    """PK/handle-key presence (table_structure.go PK/UK existence): every
    change row must carry a non-null key."""
    return routed.groupBy(F.col("target_table")).agg(
        F.sum(F.col("key").isNull().cast("long")).alias("detail_cnt")
    ).select(
        F.lit("pk_not_null").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 0).alias("passed"),
        "detail_cnt",
    )


def check_shard_schema_consistency(routed: DataFrame) -> DataFrame:
    """Sharding-merge compatibility (dm/pkg/checker/table_structure.go
    ShardingTablesChecker): all source shards feeding one target must
    present the same table structure.

    The structure signature is genuinely DERIVED per shard: for every
    column of the change images, (name, spark type, observed-at-all) —
    a shard that never carries a column (e.g. dropped upstream) produces a
    different signature and fails the check, the same class of divergence
    the reference's CREATE TABLE diff catches. One aggregation pass."""
    fields = routed.schema["after"].dataType.fields  # type: ignore[union-attr]
    per_shard = routed.groupBy("target_table", "schema", "table").agg(
        *[
            F.max(
                (
                    F.col(f"after.{f.name}").isNotNull()
                    | F.col(f"before.{f.name}").isNotNull()
                ).cast("int")
            ).alias(f"_has_{f.name}")
            for f in fields
        ]
    )
    sig = F.concat_ws(
        ",",
        *[
            F.when(
                F.col(f"_has_{f.name}") == 1,
                F.lit(f"{f.name}:{f.dataType.simpleString()}"),
            )
            for f in fields
        ],
    )
    return per_shard.withColumn("sig", sig).groupBy("target_table").agg(
        F.count_distinct("sig").alias("n_sigs"),
    ).select(
        F.lit("shard_schema_consistent").alias("check_name"),
        "target_table",
        (F.col("n_sigs") == 1).alias("passed"),
        F.col("n_sigs").alias("detail_cnt"),
    )


def check_case_collisions(routed: DataFrame) -> DataFrame:
    """Case-sensitivity check (checker.go case-sensitive table names):
    distinct source (schema, table) pairs must not collide after lower()."""
    pairs = routed.select("target_table", "schema", "table").distinct()
    return pairs.groupBy(
        "target_table",
        F.lower(F.col("schema")).alias("ls"),
        F.lower(F.col("table")).alias("lt"),
    ).agg(F.count(F.lit(1)).alias("n")).groupBy("target_table").agg(
        F.sum((F.col("n") > 1).cast("long")).alias("detail_cnt")
    ).select(
        F.lit("no_case_collisions").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 0).alias("passed"),
        "detail_cnt",
    )


def check_auto_increment_conflicts(routed: DataFrame) -> DataFrame:
    """Auto-increment key conflict across shards
    (dm/pkg/checker/table_structure.go AutoIncrementKeyChecking): merging N
    shards whose auto-inc PKs overlap silently REPLACEs rows — flag any key
    observed in more than one source shard of the same target."""
    per_key = (
        routed.select("target_table", "key", "schema", "table")
        .distinct()
        .groupBy("target_table", "key")
        .agg(F.count(F.lit(1)).alias("n_shards"))
    )
    return per_key.groupBy("target_table").agg(
        F.sum((F.col("n_shards") > 1).cast("long")).alias("detail_cnt")
    ).select(
        F.lit("no_auto_increment_conflicts").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 0).alias("passed"),
        "detail_cnt",
    )


def run_prechecks(routed: DataFrame) -> DataFrame:
    """All prechecks as one unioned result set (dm/checker/checker.go Check)."""
    checks = [
        check_pk_not_null(routed),
        check_shard_schema_consistency(routed),
        check_case_collisions(routed),
        check_auto_increment_conflicts(routed),
    ]
    return reduce(DataFrame.unionByName, checks)
