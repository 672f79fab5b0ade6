"""Syncpoint snapshots: hardlink-cloned consistent reads of the bucketed
target that survive every later mutation of the live target."""

import os

from pyspark.sql import functions as F

from tiflow_spark.sinks.bucketed import (
    compact_deltas,
    merge_hash_bucketed,
    read_state,
    snapshot_target,
    syncpoint_snapshot,
)


def _chg(spark, rows):
    return spark.createDataFrame(
        rows,
        "op STRING, target_table STRING, key STRING, commit_ts LONG, "
        "seq LONG, balance DOUBLE",
    )


def _state(spark, path):
    return {
        (r["target_table"], r["key"]): r["balance"]
        for r in read_state(spark, path).collect()
    }


def test_snapshot_is_immutable_under_later_merges(spark, tmp_path):
    target = str(tmp_path / "t")
    snaps = str(tmp_path / "snaps")
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "1", 10, 1, 100.0), ("I", "a", "2", 10, 2, 200.0)]),
        target, n_buckets=4, batch_id=0,
    )
    sp = syncpoint_snapshot(target, snaps, primary_ts=10)
    assert os.path.isdir(sp["path"])
    frozen = _state(spark, sp["path"])
    assert frozen == {("a", "1"): 100.0, ("a", "2"): 200.0}

    # live target moves on: update, delete, delta append, compaction
    merge_hash_bucketed(
        _chg(spark, [("U", "a", "1", 20, 3, 111.0), ("D", "a", "2", 20, 4, None)]),
        target, n_buckets=4, batch_id=1,
    )
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "3", 30, 5, 300.0)]),
        target, n_buckets=4, batch_id=2, mode="delta",
    )
    compact_deltas(spark, target)
    assert _state(spark, target) == {("a", "1"): 111.0, ("a", "3"): 300.0}
    # the syncpoint read is unchanged through all of it
    assert _state(spark, sp["path"]) == frozen


def test_syncpoint_idempotent_and_indexed(spark, tmp_path):
    target = str(tmp_path / "t")
    snaps = str(tmp_path / "snaps")
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "1", 10, 1, 1.0)]), target, n_buckets=2, batch_id=0
    )
    a = syncpoint_snapshot(target, snaps, primary_ts=10)
    merge_hash_bucketed(
        _chg(spark, [("U", "a", "1", 20, 2, 2.0)]), target, n_buckets=2, batch_id=1
    )
    # replayed syncpoint returns the existing mapping, no second clone
    b = syncpoint_snapshot(target, snaps, primary_ts=10)
    assert a == b
    c = syncpoint_snapshot(target, snaps, primary_ts=20)
    assert c["path"] != a["path"]
    assert _state(spark, a["path"]) == {("a", "1"): 1.0}
    assert _state(spark, c["path"]) == {("a", "1"): 2.0}


def test_snapshot_includes_unconsumed_deltas(spark, tmp_path):
    target = str(tmp_path / "t")
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "1", 10, 1, 1.0)]), target, n_buckets=2, batch_id=0
    )
    merge_hash_bucketed(
        _chg(spark, [("U", "a", "1", 20, 2, 5.0)]),
        target, n_buckets=2, batch_id=1, mode="delta",
    )
    snap = str(tmp_path / "s1")
    snapshot_target(target, snap)
    # snapshot carries the merge-on-read delta → sees the updated value
    assert _state(spark, snap) == {("a", "1"): 5.0}
    # later compaction of the live target does not disturb the snapshot
    compact_deltas(spark, target)
    assert _state(spark, snap) == {("a", "1"): 5.0}


def test_snapshot_refuses_existing_path(spark, tmp_path):
    target = str(tmp_path / "t")
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "1", 10, 1, 1.0)]), target, n_buckets=2, batch_id=0
    )
    snap = str(tmp_path / "s")
    snapshot_target(target, snap)
    import pytest

    with pytest.raises(ValueError):
        snapshot_target(target, snap)


def test_maintenance_syncpoint_action(spark, tmp_path):
    from tiflow_spark.tools import target_maintenance

    target = str(tmp_path / "t")
    merge_hash_bucketed(
        _chg(spark, [("I", "a", "1", 10, 1, 1.0)]), target, n_buckets=2, batch_id=0
    )
    out = target_maintenance(
        spark, target, "syncpoint",
        snapshots_root=str(tmp_path / "snaps"), primary_ts=10,
    )
    assert out["action"] == "syncpoint"
    assert _state(spark, out["path"]) == {("a", "1"): 1.0}


def test_streaming_syncpoints_capture_batch_boundaries(spark, sf_dir):
    """Live changefeed with syncpoint_every=1: each micro-batch leaves an
    immutable snapshot whose state equals the prefix of the stream applied
    so far — the consistent-read contract across a running replication."""
    import shutil
    import tempfile

    from tiflow_spark.envelope import events_to_changes, load_table
    from tiflow_spark.operators import filters as flt
    from tiflow_spark.operators import transforms as tfm
    from tiflow_spark.operators.apply import changes_to_state
    from tiflow_spark.plans.parity import DEMO_CFG
    from tiflow_spark.sinks.bucketed import _read_json
    from tiflow_spark.streaming.pipeline import run_changefeed

    work = tempfile.mkdtemp(prefix="tiflow_sp_")
    try:
        env = events_to_changes(load_table(spark, sf_dir, "events"))
        src = f"{work}/source"
        # two source files → (with maxFilesPerTrigger=8 default) one batch;
        # write 16+ files to force at least two micro-batches
        for chunk in range(16):
            env.filter(F.col("seq") % 16 == chunk).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        run_changefeed(spark, src, DEMO_CFG, work, syncpoint_every=1)

        index = _read_json(f"{work}/syncpoints/_syncpoints.json")
        assert index and len(index["syncpoints"]) >= 2

        # the LAST syncpoint (by applied batch order — arrival order is
        # not ts order) equals the fully-applied state
        last = max(index["syncpoints"].values(), key=lambda e: e["batch_id"])
        snap_state = read_state(spark, last["path"]).select(
            "target_table", "key", "id", "balance", "note"
        )
        expected = changes_to_state(
            tfm.split_updates(
                tfm.route(flt.apply_filters(env, DEMO_CFG), DEMO_CFG)
            ),
            table_col="target_table",
        ).select("target_table", "key", "id", "balance", "note")
        assert snap_state.exceptAll(expected).count() == 0
        assert expected.exceptAll(snap_state).count() == 0

        # an EARLIER syncpoint is a strict prefix: fewer or equal rows, and
        # it never contains a commit_ts beyond its primary_ts
        first = min(index["syncpoints"].values(), key=lambda e: e["primary_ts"])
        if first["path"] != last["path"]:
            early = spark.read.parquet(first["path"])
            assert (
                early.agg(F.max("commit_ts")).collect()[0][0]
                <= first["primary_ts"]
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_changefeed_status_rollup(spark, sf_dir):
    import shutil
    import tempfile

    from tiflow_spark.envelope import events_to_changes, load_table
    from tiflow_spark.plans.parity import DEMO_CFG
    from tiflow_spark.tools import changefeed_status, create_changefeed

    work = tempfile.mkdtemp(prefix="tiflow_status_")
    try:
        env = events_to_changes(load_table(spark, sf_dir, "events"))
        src = f"{work}/source"
        env.repartition(2).write.mode("append").parquet(src)
        spec, _ = create_changefeed(
            spark, src, DEMO_CFG,
            "mysql://root@db:3306/x?sync-point=true", work,
        )
        assert spec.kind == "mysql"
        st = changefeed_status(spark, work)
        assert st["batches"] >= 1
        assert st["events_applied"] > 0
        assert st["resolved_ts"] is not None
        assert st["target"]["n_bucket_dirs"] > 0
        assert len(st["syncpoints"]) >= 1
        sp = next(iter(st["syncpoints"].values()))
        assert read_state(spark, sp["path"]).count() > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
