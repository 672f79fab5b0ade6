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
