"""Transaction grouping, sink atomicity, large-txn handling, BDR loopback.

Reference surfaces re-expressed Spark-first:

- **Atomicity / txn splitting** — the sink's AtomicityLevel
  (pkg/config/sink.go:103-131): ``table`` keeps a single-table transaction
  inside one flush (SingleTableTxn, cdc/model/sink.go); ``none`` lets the
  sink split transactions into max-row batches (the MQ/storage sinks always
  run this way, sink.go:1187). Here a "flush" is a deterministic sub-batch
  id every downstream writer can group on — the Spark analog of the DML
  worker's batch queues (dm/syncer/dml_worker.go).
- **Large transactions must not block the watermark**
  (docs/design/2024-01-22-ticdc-large-txn-not-block-wm.md): the old
  resolved-ts took min(start_ts) over ALL ongoing txns, so one large
  prewrite pinned the watermark; the redesign tracks large txns on the side
  and advances the watermark past them. :func:`resolved_ts_with_txn_holdout`
  computes both watermarks so the lag a large txn would have caused is
  observable per table.
- **BDR loopback filtering** — in bidirectional replication each cluster's
  sink stamps its writes with a source id (``tidb_cdc_write_source``
  session variable, pkg/sink/mysql/db_helper.go:334-343; SourceID config
  pkg/config/sink.go:166-170) and each capture's kv client asks the store
  to drop CDC-stamped rows (``FilterLoop``, cdc/kv/shared_client.go:148,
  :516) so a row never replicates back around the ring.
  :func:`filter_loopback` is that predicate over the envelope.

All pure DataFrame expressions — window functions and codegen'd predicates,
no Python row path; every shuffle is on the txn/table key the downstream
grouping needs anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_txn_id(env: DataFrame, txn_cols: Sequence[str]) -> DataFrame:
    """Stamp a deterministic transaction id from the grouping columns
    (the reference groups by the upstream txn's startTs + table —
    SingleTableTxn, cdc/model/sink.go)."""
    return env.withColumn(
        "txn_id", F.concat_ws("/", *[F.col(c).cast("string") for c in txn_cols])
    )


def assign_flush_batches(
    env: DataFrame,
    txn_cols: Sequence[str],
    max_txn_rows: int,
    atomicity: str = "none",
) -> DataFrame:
    """Deterministic flush sub-batches per transaction.

    ``atomicity="none"`` (AtomicityLevel.ShouldSplitTxn,
    pkg/config/sink.go:106-112): rows are numbered in event order inside
    the txn and packed into ``ceil(txn_rows / max_txn_rows)`` flushes of at
    most ``max_txn_rows`` — the multirow-DML batch shape.

    ``atomicity="table"``: a transaction is never split — every row lands
    in flush 0 — but transactions exceeding ``max_txn_rows`` are flagged
    ``oversize`` (the sink's backpressure signal; the reference's memory
    quota plays this role, cdc/processor/sinkmanager/manager.go:170).

    Adds: txn_id, txn_rows, flush_seq, oversize. One shuffle on the txn key.
    """
    if atomicity not in ("none", "table"):
        raise ValueError(f"unknown atomicity level: {atomicity}")
    stamped = with_txn_id(env, txn_cols)
    w = Window.partitionBy("txn_id").orderBy("commit_ts", "seq")
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stamped = stamped.withColumn(
        "txn_rows", F.count(F.lit(1)).over(w_all)
    ).withColumn("oversize", F.col("txn_rows") > F.lit(max_txn_rows))
    if atomicity == "none":
        flush = ((F.row_number().over(w) - 1) / F.lit(max_txn_rows)).cast(
            "int"
        )
    else:
        flush = F.lit(0)
    return stamped.withColumn("flush_seq", flush)


def txn_stats(env: DataFrame, txn_cols: Sequence[str]) -> DataFrame:
    """Per-transaction sizing facts: row count, ts span, table fan-out —
    what the sink manager's memory quota reasons about."""
    stamped = with_txn_id(env, txn_cols)
    return stamped.groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("txn_rows"),
        F.min("commit_ts").alias("first_ts"),
        F.max("commit_ts").alias("last_ts"),
        F.min("start_ts").alias("start_ts"),
        F.countDistinct("table").alias("n_tables"),
    )


def resolved_ts_with_txn_holdout(
    env: DataFrame,
    txn_cols: Sequence[str],
    max_txn_rows: int,
    table_col: str = "table",
) -> DataFrame:
    """Per-table watermark with large transactions held out.

    ``wm_blocked`` is the OLD mechanism (the design doc's problem
    statement): min(start_ts) - 1 over large ("still prewriting")
    transactions — one large txn pins the whole table's watermark to its
    relatively old start_ts. ``wm_advanced`` is the redesign: the watermark
    over ordinary rows only, with held-out large txns tracked on the side
    (``heldout_txns``). ``wm_lag_us`` is exactly the freshness a large txn
    would have cost (docs/design/2024-01-22-ticdc-large-txn-not-block-wm.md,
    Goals: "large transactions don't block the advancing of watermarks").
    """
    sized = assign_flush_batches(
        env, txn_cols, max_txn_rows, atomicity="table"
    )
    return sized.groupBy(F.col(table_col).alias("table")).agg(
        F.coalesce(
            F.min(F.when(F.col("oversize"), F.col("start_ts"))) - F.lit(1),
            F.max("commit_ts"),
        ).alias("wm_blocked"),
        F.coalesce(
            F.max(F.when(~F.col("oversize"), F.col("commit_ts"))),
            F.max("commit_ts"),
        ).alias("wm_advanced"),
        F.countDistinct(
            F.when(F.col("oversize"), F.col("txn_id"))
        ).alias("heldout_txns"),
    ).withColumn(
        "wm_lag_us", F.col("wm_advanced") - F.col("wm_blocked")
    )


def filter_loopback(
    env: DataFrame, source_col: str = "write_source"
) -> DataFrame:
    """BDR-mode loopback filter: drop rows stamped by ANY CDC write source.

    In bidirectional replication every cluster's sink writes under a
    nonzero ``tidb_cdc_write_source`` (pkg/sink/mysql/db_helper.go:334-343);
    locally-originated rows carry 0/NULL. Replicating only unstamped rows
    breaks the A→B→A loop — the kv client's ``FilterLoop`` request flag
    (cdc/kv/shared_client.go:516) pushed down to the envelope scan (a
    codegen'd predicate Catalyst pushes into the source read).
    """
    c = F.col(source_col)
    return env.filter(c.isNull() | (c == 0))
