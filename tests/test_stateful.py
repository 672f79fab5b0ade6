"""applyInPandasWithState last-state operator: cross-batch keyed state."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tiflow_spark.envelope import events_to_changes, load_table
from tiflow_spark.operators import filters as flt
from tiflow_spark.operators import transforms as tfm
from tiflow_spark.operators.apply import changes_to_state
from tiflow_spark.plans.parity import DEMO_CFG
from tiflow_spark.streaming.pipeline import read_change_stream, transform_stream
from tiflow_spark.streaming.stateful import stateful_last_state


@pytest.fixture()
def work_dir():
    d = tempfile.mkdtemp(prefix="tiflow_stateful_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_last_state_converges_to_batch_apply(spark, sf_dir, work_dir):
    env = events_to_changes(load_table(spark, sf_dir, "events"))
    src = f"{work_dir}/source"
    # two separate file drops → at least two micro-batches via maxFilesPerTrigger
    env.filter(F.col("seq") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    env.filter(F.col("seq") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = transform_stream(read_change_stream(spark, src), DEMO_CFG)
    changelog = stateful_last_state(stream)

    out = f"{work_dir}/out"
    q = (
        changelog.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per key == batch apply result (for non-deleted keys)
    emitted = spark.read.parquet(out)
    from pyspark.sql import Window

    w = Window.partitionBy("target_table", "key").orderBy(
        F.col("commit_ts").desc(), F.col("seq").desc()
    )
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter("op <> 'D'")
        .select("target_table", "key", "id", "balance", "note")
    )
    expected = changes_to_state(
        tfm.split_updates(tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)),
        table_col="target_table",
    ).select("target_table", "key", "id", "balance", "note")
    assert final.count() == expected.count()
    assert final.exceptAll(expected).count() == 0
