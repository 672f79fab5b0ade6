"""DM full-migration lifecycle e2e (dm/worker/subtask.go ModeAll):
dump (chunked snapshot) → load (seed the target) → sync (streaming
incremental catch-up) → verify with the engine's own sync_diff checksums —
the reference's differential-testing strategy end to end.
"""

import pyspark.sql.functions as F

from tiflow_spark.config import TaskConfig
from tiflow_spark.envelope import events_to_changes, load_table
from tiflow_spark.operators import filters as flt
from tiflow_spark.operators import transforms as tfm
from tiflow_spark.plans.parity import DEMO_CFG


def test_full_migration_dump_load_sync_validate(spark, sf_dir, tmp_path):
    from tiflow_spark.operators.apply import changes_to_state
    from tiflow_spark.sinks.bucketed import merge_hash_bucketed, read_state
    from tiflow_spark.sources.jdbc_source import ChunkSpec, chunk_predicates
    from tiflow_spark.streaming.pipeline import run_changefeed
    from tiflow_spark.validation.syncdiff import compare_checksums

    # -- dump: chunked snapshot export of the upstream table (4 range scans)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    b = cust.agg(
        F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi")
    ).collect()[0]
    bounds = [b.lo + (b.hi - b.lo) * i // 4 for i in (1, 2, 3)]
    chunks = [
        cust.filter(F.expr(p))
        for p in chunk_predicates(ChunkSpec("c_custkey", bounds))
    ]
    snapshot_events = None
    for part in chunks:
        rows = part.select(
            F.lit("I").alias("op"),
            F.lit("snap").alias("schema"),
            F.lit("customer").alias("table"),
            F.lit(0).cast("long").alias("commit_ts"),
            F.lit(0).cast("long").alias("start_ts"),
            F.col("c_custkey").alias("seq"),
            F.col("c_custkey").cast("string").alias("key"),
            F.lit(None)
            .cast("struct<id:bigint,balance:double,note:string>")
            .alias("before"),
            F.struct(
                F.col("c_custkey").alias("id"),
                F.round("c_acctbal", 2).alias("balance"),
                F.col("c_mktsegment").alias("note"),
            ).alias("after"),
        )
        snapshot_events = (
            rows if snapshot_events is None else snapshot_events.unionByName(rows)
        )

    # -- load: seed the streaming target with the snapshot (the load unit)
    work = str(tmp_path / "work")
    seed = snapshot_events.select(
        F.lit("events_all").alias("target_table"),
        "key",
        "op",
        "commit_ts",
        "seq",
        F.col("after.id").alias("id"),
        F.col("after.balance").alias("balance"),
        F.col("after.note").alias("note"),
    )
    merge_hash_bucketed(seed, f"{work}/target", n_buckets=32, batch_id=0)

    # -- sync: incremental catch-up from the change stream (seq scaled past
    #    the snapshot's seq domain so ordering stays unambiguous)
    env = events_to_changes(load_table(spark, sf_dir, "events"))
    src = str(tmp_path / "source")
    env.repartition(4).write.mode("append").parquet(src)
    run_changefeed(spark, src, DEMO_CFG, work)

    applied = read_state(spark, f"{work}/target").select(
        "target_table", "key", "id", "balance", "note"
    )

    # -- expected: batch replay of snapshot-events + change stream
    split = tfm.split_updates(
        tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)
    )
    combined = snapshot_events.withColumn(
        "target_table", F.lit("events_all")
    ).unionByName(split, allowMissingColumns=True)
    expected = changes_to_state(combined, table_col="target_table")

    # -- verify: the engine's OWN sync_diff chunk checksums (BIT_XOR MD5)
    cols = ["target_table", "key", "id", "balance", "note"]
    diff = compare_checksums(applied, expected, "id", cols, width=100)
    bad = diff.filter(~F.col("match")).count()
    assert bad == 0, f"sync_diff found {bad} mismatched chunks"
    assert applied.count() == expected.count()


def test_start_task_mode_all_matches_batch(spark, sf_dir, tmp_path):
    """dmctl start-task facade (ModeAll): load a snapshot then sync the
    change stream in one call; final state equals the batch replay of
    snapshot + changes (subtask.go createRealUnits composition)."""
    from tiflow_spark.operators.apply import changes_to_state
    from tiflow_spark.sinks.bucketed import read_state
    from tiflow_spark.tools import start_task

    snapshot = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            F.col("c_custkey").cast("string").alias("key"),
            F.lit("I").alias("op"),
            F.lit(0).cast("long").alias("commit_ts"),
            F.col("c_custkey").alias("seq"),
            F.col("c_custkey").alias("id"),
            F.round("c_acctbal", 2).alias("balance"),
            F.col("c_mktsegment").alias("note"),
        )
    )
    env = events_to_changes(load_table(spark, sf_dir, "events"))
    src = str(tmp_path / "source")
    env.repartition(2).write.mode("append").parquet(src)

    status = start_task(
        spark,
        DEMO_CFG,
        str(tmp_path / "work"),
        snapshot=snapshot,
        source_dir=src,
        mode="all",
    )
    assert status["loaded_rows"] == snapshot.count()
    assert status["batches"] >= 1 and status["target_rows"] > 0

    applied = read_state(spark, str(tmp_path / "work" / "target")).select(
        "target_table", "key", "id", "balance", "note"
    )
    split = tfm.split_updates(
        tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)
    )
    snap_env = snapshot.select(
        F.lit("events_all").alias("target_table"),
        "key", "op", "commit_ts", "seq",
        F.lit(None)
        .cast("struct<id:bigint,balance:double,note:string>")
        .alias("before"),
        F.struct("id", "balance", "note").alias("after"),
    )
    expected = changes_to_state(
        snap_env.unionByName(split, allowMissingColumns=True),
        table_col="target_table",
    ).select("target_table", "key", "id", "balance", "note")
    assert applied.count() == expected.count()
    assert applied.exceptAll(expected).count() == 0
    assert expected.exceptAll(applied).count() == 0


def test_start_task_mode_validation(spark, tmp_path):
    import pytest as _pytest

    from tiflow_spark.tools import start_task

    with _pytest.raises(ValueError):
        start_task(spark, DEMO_CFG, str(tmp_path), mode="bogus")
    with _pytest.raises(ValueError):
        start_task(spark, DEMO_CFG, str(tmp_path), mode="full")  # no snapshot
