"""Txn atomicity / large-txn holdout / BDR loopback operator semantics
(pkg/config/sink.go:103-131; docs/design/2024-01-22-ticdc-large-txn-not-
block-wm.md; cdc/kv/shared_client.go FilterLoop)."""

import pyspark.sql.functions as F
import pytest

from tiflow_spark.operators.txn import (
    assign_flush_batches,
    filter_loopback,
    resolved_ts_with_txn_holdout,
    txn_stats,
)

SCHEMA = (
    "schema string, table string, op string, commit_ts long, start_ts long, "
    "seq long, key string"
)


def _env(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _txn(ts0, n, schema="s0", table="t", start=None):
    """One txn: n rows at commit_ts ts0.., all sharing txn col (schema, ts0//100)."""
    return [
        (schema, table, "U", ts0 + i, start if start is not None else ts0 - 5,
         ts0 * 100 + i, str(i))
        for i in range(n)
    ]


def test_split_none_packs_event_ordered_batches(spark):
    env = _env(spark, _txn(100, 10))
    out = assign_flush_batches(
        env, ("schema", "start_ts"), max_txn_rows=4, atomicity="none"
    )
    rows = sorted(
        (r.seq, r.flush_seq, r.txn_rows, r.oversize) for r in out.collect()
    )
    # 10 rows → flushes of 4/4/2, in (commit_ts, seq) order
    assert [r[1] for r in rows] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert all(r[2] == 10 and r[3] for r in rows)  # oversize flagged


def test_split_table_atomicity_never_splits(spark):
    env = _env(spark, _txn(100, 10) + _txn(500, 2))
    out = assign_flush_batches(
        env, ("schema", "start_ts"), max_txn_rows=4, atomicity="table"
    )
    assert out.filter(F.col("flush_seq") != 0).count() == 0
    over = {r.start_ts: r.oversize for r in out.collect()}
    assert over[95] is True and over[495] is False
    with pytest.raises(ValueError):
        assign_flush_batches(env, ("schema",), 4, atomicity="bogus")


def test_holdout_watermark_advances_past_large_txn(spark):
    # large txn (6 rows, old start_ts=10) + fresh small txns
    env = _env(
        spark,
        _txn(1000, 6, start=10) + _txn(2000, 2) + _txn(3000, 1),
    )
    wm = resolved_ts_with_txn_holdout(
        env, ("schema", "start_ts"), max_txn_rows=4
    ).collect()[0]
    assert wm.wm_blocked == 9  # pinned to large txn's start_ts - 1
    assert wm.wm_advanced == 3000  # advances over ordinary rows
    assert wm.heldout_txns == 1
    assert wm.wm_lag_us == 3000 - 9
    # no large txns → both watermarks coincide at max commit_ts
    wm2 = resolved_ts_with_txn_holdout(
        _env(spark, _txn(2000, 2)), ("schema", "start_ts"), max_txn_rows=4
    ).collect()[0]
    assert wm2.wm_blocked == wm2.wm_advanced == 2001 and wm2.heldout_txns == 0


def test_txn_stats(spark):
    env = _env(spark, _txn(100, 3) + _txn(500, 1, table="t2"))
    stats = {r.txn_id: r for r in txn_stats(env, ("schema", "start_ts")).collect()}
    assert stats["s0/95"].txn_rows == 3
    assert stats["s0/95"].first_ts == 100 and stats["s0/95"].last_ts == 102
    assert stats["s0/495"].n_tables == 1


def test_filter_loopback_drops_any_cdc_stamped_row(spark):
    env = _env(spark, _txn(100, 4)).withColumn(
        "write_source",
        F.when(F.col("seq") % 2 == 0, 7).otherwise(
            F.when(F.col("seq") % 3 == 0, F.lit(None)).otherwise(0)
        ),
    )
    kept = filter_loopback(env)
    assert kept.count() == 2  # NULL and 0 kept; nonzero stamped dropped
    assert kept.filter(F.col("write_source") == 7).count() == 0
