"""Continuous data validator — DM's validator as a distributed anti-join.

Reference: dm/syncer/data_validator.go:173-737 (tail binlog, buffer row
changes, periodically SELECT the target by PK and compare),
dm/syncer/validate_worker.go (batch compare + retry window),
dm/syncer/validator_cond.go:22-74 (PK-batch WHERE clause).

Spark shape: the per-PK SELECT-and-compare becomes ONE left join of the
net change batch against the target table on the key — the join shuffles
both sides once on the key (or broadcasts a small change batch); no
driver-side loops, no per-row queries. At 100 TB the target side prunes to
the joined keys via DPP/bucketing when the target is bucketed by key.

Row states mirror the reference (validate_worker.go):
  ok      — target row matches the expected post-image
  error   — mismatch/missing older than the retry window (errorRowDelay)
  pending — mismatch/missing still inside the retry window (in-flight)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_rows(
    changes: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    pending_after_ts,
    op_col: str = "op",
) -> DataFrame:
    """Classify each net change row against the applied target table.

    ``changes``: net last-state per key (op I/U/D + expected post-image
    columns named like the target's). ``pending_after_ts``: commit_ts
    cutoff modelling the retry window — newer mismatches are "pending".
    """
    tgt = target.select(
        *[F.col(k).alias(f"_t_{k}") for k in key_cols],
        *[F.col(c).alias(f"_t_{c}") for c in compare_cols],
    )
    cond = [changes[k] == tgt[f"_t_{k}"] for k in key_cols]
    joined = changes.join(tgt, on=cond, how="left")

    exists = F.col(f"_t_{key_cols[0]}").isNotNull()

    def col_eq(c: str) -> Column:
        a, b = F.col(c), F.col(f"_t_{c}")
        return (a.isNull() & b.isNull()) | (a == b)

    matches = exists
    for c in compare_cols:
        matches = matches & col_eq(c)

    is_delete = F.col(op_col) == "D"
    ok = F.when(is_delete, ~exists).otherwise(matches)
    state = (
        F.when(ok, F.lit("ok"))
        .when(
            F.col("commit_ts")
            >= (
                pending_after_ts
                if isinstance(pending_after_ts, Column)
                else F.lit(pending_after_ts)
            ),
            F.lit("pending"),
        )
        .otherwise(F.lit("error"))
    )
    return joined.select(
        *[changes[c] for c in changes.columns],
        state.alias("row_state"),
    )


def validator_stats(validated: DataFrame, table_col: str = "table") -> DataFrame:
    """Per-table pending/error counters (data_validator.go:173-249 —
    the validator's progress/status table). Map-side combinable."""
    return validated.groupBy(F.col(table_col).alias("table")).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum((F.col("row_state") == "ok").cast("long")).alias("ok_rows"),
        F.sum((F.col("row_state") == "pending").cast("long")).alias(
            "pending_rows"
        ),
        F.sum((F.col("row_state") == "error").cast("long")).alias("error_rows"),
    )
