"""Bank invariant — the reference's flagship consistency test
(tests/integration_tests/bank/{bank.go,case.go}): concurrent transfer
transactions stream-applied downstream; at every syncpoint the total
balance must be conserved.

Stresses compaction + last-writer-wins apply + streaming batch boundaries
together. Also: negative precheck case (shard missing a column must fail
shard_schema_consistency, dm/pkg/checker/table_structure.go).
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

N_ACCOUNTS = 20
INIT_BALANCE = 1000.0
N_TXNS = 300

ENV_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("start_ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("balance", T.DoubleType()),
                    T.StructField("note", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("balance", T.DoubleType()),
                    T.StructField("note", T.StringType()),
                ]
            ),
        ),
    ]
)


def _bank_workload():
    """Deterministic transfer history: each txn debits one account and
    credits another (two U legs, same commit_ts/start_ts = one upstream
    txn). Returns (envelope_rows, final_balances)."""
    bal = {a: INIT_BALANCE for a in range(N_ACCOUNTS)}
    rows = []
    t0 = 1_700_000_000_000_000
    for i in range(1, N_TXNS + 1):
        x, y = (i * 7) % N_ACCOUNTS, (i * 13 + 3) % N_ACCOUNTS
        if x == y:
            y = (y + 1) % N_ACCOUNTS
        amt = float(1 + i % 50)
        ts = t0 + i * 1_000
        for acct, delta, leg in ((x, -amt, 0), (y, amt, 1)):
            before = (acct, bal[acct], "bank")
            bal[acct] += delta
            after = (acct, bal[acct], "bank")
            rows.append(
                ("U", "bank", "accounts", ts, ts - 1, 2 * i + leg,
                 str(acct), before, after)
            )
    return rows, bal


def test_bank_balance_conserved_at_every_syncpoint(spark, tmp_path):
    from tiflow_spark.config import TaskConfig
    from tiflow_spark.streaming.pipeline import StreamingTarget, run_changefeed

    rows, final_bal = _bank_workload()
    src = str(tmp_path / "source")
    # 16 txn-aligned files -> multiple micro-batches (maxFilesPerTrigger=8),
    # every batch boundary is a txn boundary, like the reference's syncpoints
    df = spark.createDataFrame(rows, ENV_SCHEMA)
    for chunk in range(16):
        df.filter((F.col("seq") / 2).cast("long") % 16 == chunk).coalesce(
            1
        ).write.mode("append").parquet(src)

    totals = []

    class RecordingTarget(StreamingTarget):
        def merge_batch(self, batch, batch_id):
            super().merge_batch(batch, batch_id)
            total = (
                batch.sparkSession.read.parquet(self.target_path)
                .agg(F.sum("balance"))
                .collect()[0][0]
            )
            totals.append(total)

    import tiflow_spark.streaming.pipeline as pipe

    orig = pipe.StreamingTarget
    pipe.StreamingTarget = RecordingTarget
    try:
        run_changefeed(spark, src, TaskConfig(), str(tmp_path / "work"))
    finally:
        pipe.StreamingTarget = orig

    assert len(totals) >= 2, "expected multiple micro-batches"
    expected_total = N_ACCOUNTS * INIT_BALANCE
    for t in totals:
        assert t == pytest.approx(expected_total), (
            f"balance leaked at a syncpoint: {totals}"
        )

    # final per-account state must equal the directly-computed ledger
    from tiflow_spark.sinks.bucketed import read_state

    final = read_state(spark, str(tmp_path / "work" / "target"))
    got = {int(r.key): r.balance for r in final.collect()}
    assert got == pytest.approx(final_bal)


def test_precheck_fails_on_diverged_shard_structure(spark):
    """A shard that never carries a column (dropped upstream) must fail the
    shard-structure check — the genuinely-derived signature at work."""
    from tiflow_spark.validation.precheck import check_shard_schema_consistency

    def img(i, b, n):
        return (i, b, n)

    rows = [
        # shard_0.t carries all columns
        ("t_all", "shard_0", "t", "I", "1", None, img(1, 1.0, "x")),
        # shard_1.t never has 'note'
        ("t_all", "shard_1", "t", "I", "2", None, img(2, 2.0, None)),
        ("t_all", "shard_1", "t", "U", "2", img(2, 2.0, None), img(2, 3.0, None)),
    ]
    sch = T.StructType(
        [
            T.StructField("target_table", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("before", ENV_SCHEMA["before"].dataType),
            T.StructField("after", ENV_SCHEMA["after"].dataType),
        ]
    )
    routed = spark.createDataFrame(rows, sch)
    out = check_shard_schema_consistency(routed).collect()
    assert len(out) == 1
    assert out[0].passed is False and out[0].detail_cnt == 2


def test_precheck_flags_auto_increment_conflict(spark):
    """Two shards presenting the same PK for one target must be flagged
    (AutoIncrementKeyChecking analog)."""
    from tiflow_spark.validation.precheck import check_auto_increment_conflicts

    rows = [
        ("t_all", "shard_0", "t", "1"),
        ("t_all", "shard_1", "t", "1"),  # same key from a second shard
        ("t_all", "shard_1", "t", "2"),
    ]
    routed = spark.createDataFrame(
        rows, "target_table string, schema string, table string, key string"
    )
    out = check_auto_increment_conflicts(routed).collect()
    assert out[0].passed is False and out[0].detail_cnt == 1
