"""MySQL-sink DML generation — multi-row batched SQL statements.

Reference: pkg/sqlmodel/multirow.go (GenDeleteSQL :79, GenUpdateSQL :109 —
the UPDATE-as-CASE-WHEN multirow form, GenInsertSQL :212 REPLACE/INSERT/
INSERT..ON DUPLICATE KEY UPDATE), cdc/sink/dmlsink/txn/mysql/dml.go
(single-row forms) and mysql.go:417 batchSingleTxnDmls. The DM worker
groups net changes per (target table, op kind) and emits one multi-row
statement per batch of ``max_batch`` rows.

Spark shape: the statements are produced BY a DataFrame aggregation —
values are inlined (the reference binds args; we render them, since the
output here is an auditable SQL script, the same thing sync_diff's repair
writer emits). Rows are grouped into batches inside each (table, op)
partition with dense row_number arithmetic, then one `string_agg` per
batch — all JVM-side, one shuffle on (table, op). On a cluster each batch
statement lands in a different task → a 1000-executor fleet renders 100 TB
of DML scripts with no driver involvement; executing them against MySQL is
the `foreachBatch` JDBC step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sql_quote(c):
    """Render a value as a MySQL literal: strings quoted with '' doubling,
    NULL for null (mirrors sync_diff's repair writer and dml.go rendering)."""
    return F.when(c.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), F.replace(c.cast("string"), F.lit("'"), F.lit("''")), F.lit("'"))
    )


def generate_dml_sql(
    net: DataFrame,
    key_col: str,
    value_cols: list[str],
    table_col: str = "target_table",
    max_batch: int = 100,
    replace: bool = True,
) -> DataFrame:
    """Net per-key changes → multi-row DML statements.

    I/U → ``REPLACE INTO t (cols) VALUES (...),(...)`` (safe-mode idempotent
    form, row_change.go:366-390); D → ``DELETE FROM t WHERE (key) IN (...)``.
    Returns (target_table, stmt_kind, batch_no, stmt, rows_in_batch).
    """
    kind = F.when(F.col("op") == "D", F.lit("DELETE")).otherwise(
        F.lit("REPLACE" if replace else "INSERT")
    )
    w = Window.partitionBy(table_col, "stmt_kind").orderBy(key_col)
    rows = (
        net.withColumn("stmt_kind", kind)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("batch_no", ((F.col("_rn") - 1) / max_batch).cast("long"))
    )
    cols_sql = ", ".join(f"`{c}`" for c in [key_col, *value_cols])
    values_tuple = F.concat(
        F.lit("("),
        F.concat_ws(
            ", ", _sql_quote(F.col(key_col)), *[_sql_quote(F.col(c)) for c in value_cols]
        ),
        F.lit(")"),
    )
    delete_key = _sql_quote(F.col(key_col))
    piece = F.when(F.col("stmt_kind") == "DELETE", delete_key).otherwise(
        values_tuple
    )
    agg = rows.groupBy(table_col, "stmt_kind", "batch_no").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col("_rn"), piece.alias("p")))
            ).getField("p"),
            ", ",
        ).alias("body"),
        F.count(F.lit(1)).alias("rows_in_batch"),
    )
    verb = "REPLACE" if replace else "INSERT"
    stmt = F.when(
        F.col("stmt_kind") == "DELETE",
        F.concat(
            F.lit("DELETE FROM `"),
            F.col(table_col),
            F.lit(f"` WHERE `{key_col}` IN ("),
            F.col("body"),
            F.lit(")"),
        ),
    ).otherwise(
        F.concat(
            F.lit(f"{verb} INTO `"),
            F.col(table_col),
            F.lit(f"` ({cols_sql}) VALUES "),
            F.col("body"),
        )
    )
    return agg.select(
        F.col(table_col).alias("target_table"),
        "stmt_kind",
        "batch_no",
        stmt.alias("stmt"),
        "rows_in_batch",
    )
