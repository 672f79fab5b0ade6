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
