"""Changelog apply — materialize the net effect of a change stream.

The reference's MySQL sink generates per-row DML (REPLACE/UPDATE/DELETE,
cdc/sink/dmlsink/txn/mysql/dml.go) and batches it; DM's worker does the same
through N causality queues (dm/syncer/dml_worker.go). The Spark-native
equivalent is a MERGE: union the target snapshot with the change stream,
keep the winning version per key, drop deletes. Idempotent by construction
(max-(commit_ts,seq)-wins), which subsumes safe-mode REPLACE semantics
(dm/syncer/safe_mode.go).

Batch form below; streaming form = the same function inside foreachBatch
(streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.operators.compactor import last_state_per_key


def changes_to_state(env: DataFrame, table_col: str = "table") -> DataFrame:
    """Pure-stream apply: final table state from a change stream alone.

    Keeps the last event per key (one shuffle), drops keys whose final op is
    D. Returns (table, key, id, balance, note) rows — the applied image.
    """
    last = last_state_per_key(env, table_col)
    return (
        last.filter(F.col("op") != "D")
        .select(
            F.col(table_col).alias("target_table"),
            F.col("key"),
            F.col("after.id").alias("id"),
            F.col("after.balance").alias("balance"),
            F.col("after.note").alias("note"),
        )
    )


def merge_into_snapshot(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE net changes into an existing snapshot (upsert + delete) — the
    DM full+incremental mode: dump/load a snapshot, then catch up from the
    changelog (dm/worker/subtask.go ModeAll) and the MySQL-sink apply shape.

    ``changes``: one NET row per key (pre-compacted, e.g. last_state_per_key
    output) with `op_col` + the snapshot's columns. Result = snapshot with
    upserts applied and net-deletes removed.

    Scale shape: one shuffle each side on the join key; the change side is
    usually orders of magnitude smaller — Catalyst broadcasts it under the
    threshold, and a bucketed target table avoids even the snapshot shuffle.
    """
    chg = changes.select(
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in snapshot.columns],
    )
    cond = [snapshot[k] == chg[f"_c_{k}"] for k in key_cols]
    joined = snapshot.join(chg, on=cond, how="full_outer")
    is_change = F.col("_op").isNotNull()
    keep = ~is_change | (F.col("_op") != "D")
    out_cols = [
        F.when(is_change, F.col(f"_c_{c}")).otherwise(F.col(c)).alias(c)
        for c in snapshot.columns
    ]
    return joined.filter(keep).select(*out_cols)


def merge_preserving_extra_columns(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE where the downstream snapshot has columns the change stream
    does not carry — dm/tests/downstream_more_column: DM generates UPDATEs
    listing only upstream columns, so downstream-only columns (defaults,
    generated values, locally-maintained fields) survive replication.

    Same shape as :func:`merge_into_snapshot`, but SQL-faithful column
    semantics: a column absent from ``changes``' schema is PRESERVED from
    the existing row on update (new rows get NULL, the downstream
    default's job); a column present in ``changes`` is written even when
    NULL (an explicit NULL write, exactly like an UPDATE SET c = NULL).
    The present/absent distinction is schema-level, so there is no
    NULL-vs-missing ambiguity. One full-outer join on the key — identical
    cost to the plain merge.
    """
    carried = [c for c in snapshot.columns if c in set(changes.columns)]
    missing = [c for c in snapshot.columns if c not in set(changes.columns)]
    for k in key_cols:
        if k not in carried:
            raise ValueError(f"key column {k!r} missing from changes")
    chg = changes.select(
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in carried],
    )
    cond = [snapshot[k] == chg[f"_c_{k}"] for k in key_cols]
    joined = snapshot.join(chg, on=cond, how="full_outer")
    is_change = F.col("_op").isNotNull()
    keep = ~is_change | (F.col("_op") != "D")
    out = {
        c: F.when(is_change, F.col(f"_c_{c}")).otherwise(F.col(c)).alias(c)
        for c in carried
    }
    for c in missing:
        out[c] = F.col(c).alias(c)  # joined carries only the snapshot's copy
    return joined.filter(keep).select(*[out[c] for c in snapshot.columns])


def recompute_stored_columns(
    state: DataFrame, registry: DataFrame, table: str
) -> DataFrame:
    """Recompute STORED generated columns into an applied table image.

    MySQL materializes STORED generated columns on write; replicating into
    a target that lacks the source's generator means the sink must compute
    them (the reference reads generated-ness off TableInfo — ColumnFlagType
    GeneratedColumnFlag, cdc/model/sink.go:62-205 — and expr_filter.go:
    251-382 getGenerateExpr evaluates the expression; STORED columns are
    part of the persisted row). The registry's LATEST version for ``table``
    supplies (gen_exprs, gen_stored); each stored column is appended as a
    codegen'd F.expr over the state's own columns — map-only, no shuffle.

    The registry read is a metadata-scale collect (one row per schema
    version), bounded like every other registry fold.
    """
    rows = sorted(
        registry.filter(F.col("table") == table)
        .select("version_no", "gen_exprs", "gen_stored")
        .collect(),
        key=lambda r: r["version_no"],
    )
    if not rows:
        return state
    latest = rows[-1]
    out = state
    for col in latest["gen_stored"] or []:
        expr = (latest["gen_exprs"] or {}).get(col)
        if expr:
            out = out.withColumn(col, F.expr(expr))
    return out
