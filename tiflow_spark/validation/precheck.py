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

import re
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


def table_structure_facts(spark, ddl: DataFrame) -> DataFrame:
    """Per-shard table-structure facts parsed from real CREATE TABLE
    statements (dm/pkg/checker/table_structure.go reads the same facts off
    SHOW CREATE TABLE). DDL sets are metadata-scale — collected and parsed
    driver-side exactly like the schema-registry fold; the *checks* stay
    declarative aggregations over this facts frame.

    Input columns: (shard, table, query). Output one row per (shard, table):
    has_pk_uk, pk_is_float, charset, collate, n_columns."""
    from tiflow_spark.sources.ddl_parse import parse_ddl

    rows = []
    for ev in ddl.select("shard", "table", "query").collect():
        op = parse_ddl(ev.query)
        if op is None or op.kind != "create table":
            continue
        types = {c.name: c.col_type for c in op.columns}
        pk_float = any(
            re.match(r"^(FLOAT|DOUBLE|REAL)\b", types.get(c, ""))
            for c in op.pk_columns
        )
        rows.append(
            (
                ev.shard,
                ev.table,
                bool(op.pk_columns) or bool(op.unique_keys),
                pk_float,
                op.charset,
                op.collate,
                len(op.columns),
            )
        )
    return spark.createDataFrame(
        rows,
        "shard string, target_table string, has_pk_uk boolean, "
        "pk_is_float boolean, charset string, collate string, "
        "n_columns int",
    )


def check_pk_uk_exists(facts: DataFrame) -> DataFrame:
    """Every shard table must define a PRIMARY KEY or UNIQUE key
    (table_structure.go TablesChecker: no PK/UK → replication can't
    identify rows)."""
    return facts.groupBy("target_table").agg(
        F.sum((~F.col("has_pk_uk")).cast("long")).alias("detail_cnt")
    ).select(
        F.lit("pk_uk_exists").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 0).alias("passed"),
        "detail_cnt",
    )


def check_no_float_pk(facts: DataFrame) -> DataFrame:
    """FLOAT/DOUBLE-typed primary keys are flagged (inexact equality makes
    them unreliable replication handles — the reference warns on them)."""
    return facts.groupBy("target_table").agg(
        F.sum(F.col("pk_is_float").cast("long")).alias("detail_cnt")
    ).select(
        F.lit("no_float_pk").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 0).alias("passed"),
        "detail_cnt",
    )


def check_charset_consistency(facts: DataFrame) -> DataFrame:
    """All shards of one merge target must agree on table charset/collation
    (table_structure.go ShardingTablesChecker structure diff — charset
    divergence corrupts merged text comparisons). detail_cnt = number of
    distinct (charset, collate) variants; 1 passes."""
    variants = F.concat_ws(
        "/",
        F.coalesce(F.col("charset"), F.lit("<default>")),
        F.coalesce(F.col("collate"), F.lit("<default>")),
    )
    return facts.withColumn("variant", variants).groupBy(
        "target_table"
    ).agg(F.count_distinct("variant").alias("detail_cnt")).select(
        F.lit("charset_consistent").alias("check_name"),
        "target_table",
        (F.col("detail_cnt") == 1).alias("passed"),
        "detail_cnt",
    )


def run_structure_prechecks(spark, ddl: DataFrame) -> DataFrame:
    """Structure-level prechecks over shard CREATE TABLE statements — the
    data-derivable remainder of DM's checker suite (checker.go:84-731);
    privilege/binlog-format/server-version checks are connection-level and
    stay out of scope for a file-based engine."""
    facts = table_structure_facts(spark, ddl)
    checks = [
        check_pk_uk_exists(facts),
        check_no_float_pk(facts),
        check_charset_consistency(facts),
    ]
    return reduce(DataFrame.unionByName, checks)


def run_prechecks(routed: DataFrame) -> DataFrame:
    """All prechecks as one unioned result set (dm/checker/checker.go Check)."""
    checks = [
        check_pk_not_null(routed),
        check_shard_schema_consistency(routed),
        check_case_collisions(routed),
        check_auto_increment_conflicts(routed),
    ]
    return reduce(DataFrame.unionByName, checks)
