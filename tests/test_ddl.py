"""DDL side-channel: allow-list, per-kind filters, schema evolution.

Reference behaviors mirrored:
- ddlWhiteListMap drop of unsupported kinds (pkg/filter/filter.go:36-96)
- per-DDL-kind binlog filter (pkg/binlog-filter/filter.go:36-96)
- HandleDDLJob version advance (cdc/entry/schema_storage.go:122-191)
- barrier ordering (cdc/owner/ddl_manager.go:508)
"""

from pyspark.sql import functions as F

from tiflow_spark.envelope import load_table
from tiflow_spark.plans.parity import (
    DDL_CFG,
    q_ddl_barrier_plan,
    q_ddl_filter,
)
from tiflow_spark.sources.ddl_stream import (
    ddl_allowlist_predicate,
    ddl_stream,
    registry_from_ddl,
)


def test_allowlist_drops_unsupported_kinds(spark, sf_dir):
    ddl = ddl_stream(load_table(spark, sf_dir, "events"))
    kept = {r.ddl_type for r in ddl.filter(ddl_allowlist_predicate()).collect()}
    assert "analyze table" not in kept
    assert "create sequence" not in kept
    assert {"create table", "add column", "truncate table"} <= kept


def test_user_filter_drops_kinds_per_table(spark, sf_dir):
    rows = q_ddl_filter(spark, sf_dir).collect()
    scratch_kinds = {r.ddl_type for r in rows if r.table == "scratch"}
    assert scratch_kinds == {"create table"}  # truncate/drop user-filtered
    assert len(rows) == 8


def test_registry_versions_advance_cumulatively(spark, sf_dir):
    reg = registry_from_ddl(ddl_stream(load_table(spark, sf_dir, "events")))
    ev = {r.version_no: r for r in reg.filter(F.col("table") == "events").collect()}
    assert list(ev) == [1, 2, 3]
    assert ev[1].columns == ["id", "balance"] and ev[1].defaults == {}
    assert ev[2].columns == ["id", "balance", "note"]
    assert ev[2].defaults == {"note": "{}"}
    assert ev[3].columns == ["id", "balance", "note", "tier"]
    assert ev[3].defaults == {"note": "{}", "tier": "std"}
    assert ev[1].version_ts < ev[2].version_ts < ev[3].version_ts


def test_barrier_order_monotone_in_drained_dml(spark, sf_dir):
    rows = sorted(q_ddl_barrier_plan(spark, sf_dir).collect(),
                  key=lambda r: r.exec_order)
    barriers = [r.barrier_ts for r in rows]
    drained = [r.dml_before for r in rows]
    assert barriers == sorted(barriers)
    assert drained == sorted(drained)  # later DDL waits for at least as much
    assert drained[-1] > 0


def test_ddl_cfg_dml_letters_ignored_on_ddl_channel():
    # A rule naming only I/U/D must not touch the DDL channel.
    kinds = [e for r in DDL_CFG.event_filters for e in r.events]
    assert all(k not in ("I", "U", "D") for k in kinds)


def test_fk_causality_colocates_parent_and_child(spark):
    """Rows linked by FK must land in the same shuffle partition and stay
    in commit order (pkg/sqlmodel/causality.go:160-204 semantics)."""
    from pyspark.sql import functions as F

    from tiflow_spark.operators.causality import (
        FKRelation,
        partition_by_fk_causality,
    )

    rows = [
        # parent rows (events_0), key = id
        ("I", "events_0", 100, 1, "10", 10, None),
        ("I", "events_0", 101, 2, "11", 11, None),
        # children referencing parent 10 / 11 via parent_id
        ("I", "events_1", 102, 3, "900", 900, 10),
        ("I", "events_2", 103, 4, "901", 901, 10),
        ("I", "events_1", 104, 5, "902", 902, 11),
        # child with NULL fk → falls back to own key
        ("I", "events_1", 105, 6, "903", 903, None),
    ]
    env = spark.createDataFrame(
        rows,
        "op string, table string, commit_ts long, seq long, key string, "
        "id long, parent_id long",
    ).withColumn(
        "after", F.struct(F.col("id"), F.col("parent_id"))
    )
    rels = (
        FKRelation("events_1", "after.parent_id", "events_0"),
        FKRelation("events_2", "after.parent_id", "events_0"),
    )
    out = partition_by_fk_causality(env, 4, rels).withColumn(
        "pid", F.spark_partition_id()
    )
    pid = {(r.table, r.key): r.pid for r in out.collect()}
    # parent 10 and both its children share a partition
    assert pid[("events_0", "10")] == pid[("events_1", "900")]
    assert pid[("events_0", "10")] == pid[("events_2", "901")]
    # parent 11 and its child share a partition
    assert pid[("events_0", "11")] == pid[("events_1", "902")]


def test_optimistic_lock_status_lag_and_conflict(spark, sf_dir):
    """shard_2 lags on events.note (unsynced, no conflict); scratch.flag is
    varchar-vs-int across shards (conflict pauses the table)."""
    from tiflow_spark.sources.ddl_stream import optimistic_shard_ddl
    from tiflow_spark.streaming.shardddl import optimistic_lock_status

    ddl = optimistic_shard_ddl(load_table(spark, sf_dir, "events"))
    rows = {(r.table, r.shard): r for r in optimistic_lock_status(ddl).collect()}
    ev0, ev2 = rows[("events", "shard_0")], rows[("events", "shard_2")]
    assert ev0.synced is True and ev0.n_conflicts == 0
    assert ev2.synced is False and ev2.n_cols == 3 and ev2.n_joined == 4
    sc = rows[("scratch", "shard_0")]
    assert sc.n_conflicts == 1 and sc.synced is False


def test_gate_ddl_holds_back_unready_targets(spark):
    """gate_ddl drops DDL events of targets whose barrier isn't ready and
    passes everything else (per-batch gating, ddl_manager.go:508)."""
    from tiflow_spark.streaming.shardddl import gate_ddl

    env = spark.createDataFrame(
        [
            ("t_ready", "DDL", 10),
            ("t_lagging", "DDL", 10),
            ("t_lagging", "I", 9),
            ("t_ready", "U", 8),
        ],
        "target_table string, op string, commit_ts long",
    )
    barrier = spark.createDataFrame(
        [("t_ready", True), ("t_lagging", False)],
        "target_table string, barrier_ready boolean",
    )
    out = gate_ddl(env, barrier).collect()
    kept = {(r.target_table, r.op) for r in out}
    assert ("t_ready", "DDL") in kept
    assert ("t_lagging", "DDL") not in kept  # held back at the barrier
    assert ("t_lagging", "I") in kept and ("t_ready", "U") in kept


def test_asof_resolve_unit_semantics(spark):
    """Isolated as-of semantics on the hand-seeded fixture registry:
    version boundaries are inclusive, earliest version covers ts 0."""
    from pyspark.sql import functions as F

    from tiflow_spark.sources.schema_registry import asof_resolve

    reg = spark.createDataFrame(
        [
            ("events", 0, 1, ["id", "balance"], {}),
            ("events", 100, 2, ["id", "balance", "note"], {"note": "{}"}),
            ("events", 200, 3, ["id", "balance", "note", "tier"],
             {"note": "{}", "tier": "std"}),
        ],
        "table string, version_ts long, version_no int, "
        "columns array<string>, defaults map<string,string>",
    )
    events = spark.createDataFrame(
        [(1, 50), (2, 100), (3, 150), (4, 200), (5, 999)],
        "seq long, commit_ts long",
    ).withColumn("logical_table", F.lit("events"))
    got = {
        r.seq: r.version_no for r in asof_resolve(events, reg).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 3, 5: 3}
