"""target_maintenance ops surface (tools.py) — the cdc-cli/dmctl analog
for the engine's own storage."""

import pytest

from tiflow_spark.sinks.bucketed import merge_hash_bucketed, read_state
from tiflow_spark.tools import target_maintenance

SCH = (
    "target_table string, key string, op string, commit_ts long, "
    "seq long, balance double"
)


def _target(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = [("t", str(k), "I", 100, k, float(k)) for k in range(20)]
    merge_hash_bucketed(spark.createDataFrame(rows, SCH), t, n_buckets=4)
    merge_hash_bucketed(
        spark.createDataFrame([("t", "3", "D", 200, 99, None)], SCH),
        t, n_buckets=4, batch_id=1, mode="delta",
    )
    return t


def test_status_compact_purge_resize_roundtrip(spark, tmp_path):
    t = _target(spark, tmp_path)
    st = target_maintenance(spark, t, "status")
    assert st["n_buckets_meta"] == 4 and st["pending_deltas"] == ["batch-1"]
    assert target_maintenance(spark, t, "compact")["deltas_folded"] == 1
    assert target_maintenance(spark, t, "status")["pending_deltas"] == []
    target_maintenance(spark, t, "purge", safepoint_ts=300)
    assert read_state(spark, t).count() == 19  # delete applied, tombstone gone
    target_maintenance(spark, t, "resize", n_buckets=8)
    st2 = target_maintenance(spark, t, "status")
    assert st2["n_buckets_meta"] == 8 and st2["n_bucket_dirs"] <= 8
    assert read_state(spark, t).count() == 19
    with pytest.raises(ValueError):
        target_maintenance(spark, t, "defragment-the-frobnicator")
