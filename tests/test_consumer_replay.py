"""MQ consumer replay e2e (cmd/kafka-consumer + tests/mq_protocol_tests
analog): changefeed → canal-json topic → consumer replay → applied state
must equal the directly-applied change stream."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tiflow_spark.envelope import events_to_changes, load_table
from tiflow_spark.operators import filters as flt
from tiflow_spark.operators import transforms as tfm
from tiflow_spark.operators.apply import changes_to_state
from tiflow_spark.plans.parity import DEMO_CFG
from tiflow_spark.streaming.consumer import replay_broker_to_state
from tiflow_spark.tools import create_changefeed


@pytest.fixture()
def work_dir():
    d = tempfile.mkdtemp(prefix="tiflow_consumer_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_canal_json_replay_matches_direct_apply(spark, sf_dir, work_dir):
    env = events_to_changes(load_table(spark, sf_dir, "events"))
    src = f"{work_dir}/source"
    env.repartition(2).write.parquet(src)

    spec, broker = create_changefeed(
        spark, src, DEMO_CFG,
        "kafka://broker:9092/cdc-demo?protocol=canal-json&partition-num=8",
        work_dir,
    )
    assert spec.kind == "mq"

    replayed = replay_broker_to_state(
        spark, broker,
        {"id": "bigint", "balance": "double", "note": "string"},
    ).select("table", "key", "id", "balance", "note")

    transformed = tfm.split_updates(
        tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)
    )
    expected = changes_to_state(transformed, table_col="table").select(
        F.col("target_table").alias("table"), "key", "id", "balance", "note"
    )

    assert replayed.count() == expected.count()
    assert replayed.exceptAll(expected).count() == 0
    assert expected.exceptAll(replayed).count() == 0


def test_replay_prunes_by_topic(spark, sf_dir, work_dir):
    env = events_to_changes(load_table(spark, sf_dir, "events"))
    src = f"{work_dir}/source"
    env.repartition(2).write.parquet(src)
    _, broker = create_changefeed(
        spark, src, DEMO_CFG,
        "kafka://broker:9092/cdc-demo?protocol=canal-json", work_dir,
    )
    none = replay_broker_to_state(
        spark, broker, {"id": "bigint"}, topic="other-topic"
    )
    assert none.count() == 0


def test_storage_consumer_replay_to_state(spark, sf_dir, work_dir):
    """cmd/storage-consumer analog: CSV storage-sink layout read back,
    folded to last-writer state, equals direct apply. CSV carries no seq
    (reference parity), so the fold orders by commit_ts — valid because
    the fixture has no per-(key, commit_ts) ties (guard-asserted)."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        read_storage_sink,
        write_storage_sink,
    )

    env = events_to_changes(load_table(spark, sf_dir, "events"))
    transformed = tfm.split_updates(
        tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)
    )
    # guard: the commit_ts fold below is only total without ties
    assert (
        transformed.groupBy("table", "key", "commit_ts")
        .count().filter("count > 1").count() == 0
    )

    out = f"{work_dir}/storage"
    write_storage_sink(transformed, out, StorageSinkConfig())

    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    decoded = read_storage_sink(spark, out, payload)
    w = Window.partitionBy("table", "id").orderBy(F.col("commit_ts").desc())
    replayed = (
        decoded.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter(F.col("op") != "D")
        .select("table", F.col("id").cast("string").alias("key"),
                "id", "balance", "note")
    )
    expected = changes_to_state(transformed, table_col="table").select(
        F.col("target_table").alias("table"), "key", "id", "balance", "note"
    )
    assert replayed.count() == expected.count()
    assert replayed.exceptAll(expected).count() == 0
    assert expected.exceptAll(replayed).count() == 0
