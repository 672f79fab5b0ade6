"""Real-DDL parser + generic registry fold on a second, differently-shaped
table — the generality the round-2 fixture-bound fold lacked.

Reference behaviors mirrored:
- TableInfo build from DDL jobs (cdc/entry/schema_storage.go:122-191)
- MySQL column semantics: ADD appends, DROP removes, MODIFY retypes in
  place, CHANGE renames in place, RENAME TABLE moves the lineage
"""

import pyspark.sql.functions as F
import pytest

from tiflow_spark.sources.ddl_parse import ColumnDef, parse_ddl
from tiflow_spark.sources.ddl_stream import registry_from_ddl

# ------------------------------------------------------------ parser units


def test_create_table_column_list():
    op = parse_ddl(
        "CREATE TABLE `db`.`widgets` (sku VARCHAR(40) PRIMARY KEY, "
        "qty INT NOT NULL DEFAULT 0, price DECIMAL(10,2), "
        "PRIMARY KEY (sku), KEY idx_qty (qty))"
    )
    assert op.kind == "create table"
    assert (op.schema, op.table) == ("db", "widgets")
    assert [c.name for c in op.columns] == ["sku", "qty", "price"]
    assert op.columns[0].col_type == "VARCHAR(40)"
    assert op.columns[1].default == "0"
    assert op.columns[2].default is None


def test_alter_variants():
    add = parse_ddl("ALTER TABLE widgets ADD COLUMN loc VARCHAR DEFAULT 'eu'")
    assert add.kind == "add column"
    assert add.columns == (ColumnDef("loc", "VARCHAR", "eu"),)
    drop = parse_ddl("ALTER TABLE widgets DROP COLUMN qty")
    assert (drop.kind, drop.drop_column) == ("drop column", "qty")
    mod = parse_ddl("ALTER TABLE widgets MODIFY price DECIMAL(12,4) DEFAULT 1")
    assert mod.kind == "modify column"
    assert mod.columns[0] == ColumnDef("price", "DECIMAL(12,4)", "1")
    chg = parse_ddl("ALTER TABLE widgets CHANGE price cost DOUBLE")
    assert (chg.kind, chg.old_column, chg.columns[0].name) == (
        "modify column", "price", "cost",
    )
    ren = parse_ddl("RENAME TABLE widgets TO gadgets")
    assert (ren.kind, ren.table, ren.rename_to) == (
        "rename table", "widgets", "gadgets",
    )
    ren2 = parse_ddl("ALTER TABLE widgets RENAME TO gadgets")
    assert (ren2.kind, ren2.rename_to) == ("rename table", "gadgets")


def test_quoted_default_with_comma_and_escape():
    op = parse_ddl("CREATE TABLE t (a VARCHAR DEFAULT 'x,''y', b INT)")
    assert op.columns[0].default == "x,'y"
    assert [c.name for c in op.columns] == ["a", "b"]


def test_non_structural_kinds_classify_only():
    assert parse_ddl("DROP INDEX i ON t").kind == "drop index"
    assert parse_ddl("ANALYZE TABLE t").kind == "analyze table"
    assert parse_ddl("ALTER TABLE t ADD INDEX i (a)").kind == "create index"
    assert parse_ddl("ALTER TABLE t DROP PRIMARY KEY").kind == "drop primary key"
    assert parse_ddl("TRUNCATE scratch").kind == "truncate table"
    assert parse_ddl("garbage input") is None


# ------------------------------------- generic fold on a second table shape

_WIDGET_DDL = [
    # (table, commit_ts, seq, ddl_type, query)
    ("widgets", 100, 1, "create table",
     "CREATE TABLE widgets (sku VARCHAR(40) PRIMARY KEY, qty INT, "
     "price DECIMAL(10,2) DEFAULT '9.99')"),
    ("widgets", 200, 2, "add column",
     "ALTER TABLE widgets ADD COLUMN loc VARCHAR DEFAULT 'eu'"),
    ("widgets", 300, 3, "drop column",
     "ALTER TABLE widgets DROP COLUMN qty"),
    ("widgets", 400, 4, "modify column",
     "ALTER TABLE widgets MODIFY COLUMN price DECIMAL(12,4) DEFAULT '0'"),
    ("widgets", 500, 5, "rename table",
     "RENAME TABLE widgets TO gadgets"),
    ("gadgets", 600, 6, "add column",
     "ALTER TABLE gadgets ADD COLUMN grade VARCHAR DEFAULT 'a'"),
]


@pytest.fixture()
def widget_registry(spark):
    ddl = spark.createDataFrame(
        _WIDGET_DDL, "table string, commit_ts long, seq long, "
        "ddl_type string, query string"
    ).withColumn("op", F.lit("DDL"))
    return registry_from_ddl(ddl)


def test_second_table_fold_drop_modify_rename(spark, widget_registry):
    rows = {r.version_no: r for r in widget_registry.collect()}
    assert len(rows) == 6
    assert rows[1].table == "widgets"
    assert rows[1].columns == ["sku", "qty", "price"]
    assert rows[1].defaults == {"price": "9.99"}
    assert rows[2].columns == ["sku", "qty", "price", "loc"]
    assert rows[3].columns == ["sku", "price", "loc"]  # qty dropped
    assert rows[4].types["price"] == "DECIMAL(12,4)"
    assert rows[4].defaults["price"] == "0"
    # rename moves the lineage: history continues under the new name
    assert rows[5].table == "gadgets" and rows[5].columns == rows[4].columns
    assert rows[6].table == "gadgets"
    assert rows[6].columns == ["sku", "price", "loc", "grade"]
    assert rows[6].types == {
        "sku": "VARCHAR(40)", "price": "DECIMAL(12,4)",
        "loc": "VARCHAR", "grade": "VARCHAR",
    }


def test_second_table_decode_derives_from_registry(spark, widget_registry):
    """decode_with_schema on a payload whose shape shares nothing with the
    demo fixture: columns/types/defaults all flow from the registry."""
    from tiflow_spark.sources.schema_registry import (
        asof_resolve,
        decode_with_schema,
    )

    events = spark.createDataFrame(
        [
            (1, 150, "widgets", ("s1", 5, None)),
            (2, 250, "widgets", ("s2", 7, "2.50")),
            (3, 650, "gadgets", ("s3", None, None)),
        ],
        "seq long, commit_ts long, logical_table string, "
        "after struct<sku:string, qty:int, price:string>",
    )
    dec = decode_with_schema(
        asof_resolve(events, widget_registry), widget_registry
    ).collect()
    by_seq = {r.seq: r for r in dec}
    # v1 row: price NULL in payload -> create-table default 9.99
    assert by_seq[1].version_no == 1
    assert float(by_seq[1].price_resolved) == pytest.approx(9.99)
    assert by_seq[1].qty_resolved == 5
    assert "loc_resolved" in dec[0].asDict()
    assert by_seq[1].loc_resolved is None  # v1 lacks loc
    # v2 row: loc backfills its ADD COLUMN default
    assert by_seq[2].loc_resolved == "eu"
    assert float(by_seq[2].price_resolved) == pytest.approx(2.50)
    # post-rename + grade: defaults of the evolved lineage apply
    assert by_seq[3].version_no == 6
    assert by_seq[3].qty_resolved is None  # dropped before this version
    assert by_seq[3].grade_resolved == "a"


def test_do_rule_with_dml_only_events_drops_ddl(spark):
    """Binlog-filter Do semantics: a Do rule whitelisting only DML kinds
    drops every DDL for its matched tables."""
    from tiflow_spark.config import EventFilterRule, TableRule, TaskConfig
    from tiflow_spark.sources.ddl_stream import ddl_filter_predicate

    cfg = TaskConfig(
        event_filters=(
            EventFilterRule(
                tables=(TableRule("*", "scratch"),),
                events=("I", "U", "D"),
                action="Do",
            ),
        ),
    )
    ddl = spark.createDataFrame(
        [
            ("d", "scratch", "truncate table", 1),
            ("d", "events", "add column", 2),
        ],
        "schema string, table string, ddl_type string, seq long",
    )
    kept = {r.seq for r in ddl.filter(ddl_filter_predicate(cfg)).collect()}
    assert kept == {2}


def test_create_table_key_constraints_and_options():
    """Structure facts off CREATE TABLE: inline/table-level PK, UNIQUE keys,
    charset/collation table options (table_structure.go reads the same off
    SHOW CREATE TABLE)."""
    from tiflow_spark.sources.ddl_parse import parse_ddl

    op = parse_ddl(
        "CREATE TABLE t (a BIGINT, b VARCHAR(10), score FLOAT, "
        "CONSTRAINT pk_t PRIMARY KEY (a, b), UNIQUE KEY uk_b (b(5))) "
        "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin"
    )
    assert op.pk_columns == ("a", "b")
    assert op.unique_keys == (("b",),)
    assert (op.charset, op.collate) == ("utf8mb4", "utf8mb4_bin")

    inline = parse_ddl(
        "CREATE TABLE u (id INT UNSIGNED PRIMARY KEY, sid VARCHAR UNIQUE)"
    )
    assert inline.pk_columns == ("id",)
    assert inline.unique_keys == (("sid",),)
    assert inline.charset is None

    keyless = parse_ddl("CREATE TABLE logs (msg VARCHAR, ts BIGINT)")
    assert keyless.pk_columns == () and keyless.unique_keys == ()


def test_structure_prechecks(spark):
    """PK/UK existence, FLOAT-pk warning, charset consistency across shards
    (dm/pkg/checker/table_structure.go)."""
    from tiflow_spark.validation.precheck import run_structure_prechecks

    ddl = spark.createDataFrame(
        [
            ("s0", "orders",
             "CREATE TABLE orders (id BIGINT PRIMARY KEY) "
             "DEFAULT CHARSET=utf8mb4"),
            ("s1", "orders",
             "CREATE TABLE orders (id BIGINT, PRIMARY KEY (id)) "
             "DEFAULT CHARSET=latin1"),
            ("s0", "m", "CREATE TABLE m (score DOUBLE PRIMARY KEY)"),
            ("s0", "logs", "CREATE TABLE logs (msg VARCHAR)"),
        ],
        "shard string, table string, query string",
    )
    out = {
        (r.check_name, r.target_table): (r.passed, r.detail_cnt)
        for r in run_structure_prechecks(spark, ddl).collect()
    }
    assert out[("pk_uk_exists", "orders")] == (True, 0)
    assert out[("pk_uk_exists", "logs")] == (False, 1)
    assert out[("no_float_pk", "m")] == (False, 1)
    assert out[("no_float_pk", "orders")] == (True, 0)
    assert out[("charset_consistent", "orders")] == (False, 2)
    assert out[("charset_consistent", "m")] == (True, 1)


def test_multi_schema_change_parse_and_fold(spark):
    """Comma-list ALTER parses into ordered sub-ops and folds into ONE
    registry version; an index-only comma list emits no version
    (ActionMultiSchemaChange, pkg/filter/filter.go)."""
    from tiflow_spark.sources.ddl_parse import parse_ddl
    from tiflow_spark.sources.ddl_stream import registry_from_ddl

    op = parse_ddl(
        "ALTER TABLE t ADD COLUMN a INT DEFAULT '1', DROP COLUMN b, "
        "RENAME TO t2"
    )
    assert op.kind == "multi schema change"
    assert [s.kind for s in op.sub_ops] == [
        "add column", "drop column", "rename table",
    ]

    ddl = spark.createDataFrame(
        [
            ("t", 100, 1, "create table",
             "CREATE TABLE t (id BIGINT PRIMARY KEY, b INT)"),
            ("t", 200, 2, "multi schema change",
             "ALTER TABLE t ADD COLUMN a INT DEFAULT '1', DROP COLUMN b, "
             "RENAME TO t2"),
            ("t2", 300, 3, "multi schema change",
             "ALTER TABLE t2 ADD INDEX i (a), DROP INDEX j"),
        ],
        "table string, commit_ts long, seq long, ddl_type string, "
        "query string",
    )
    reg = {
        r.version_no: (r.table, list(r.columns), dict(r.defaults))
        for r in registry_from_ddl(ddl).collect()
    }
    assert reg == {
        1: ("t", ["id", "b"], {}),
        2: ("t2", ["id", "a"], {"a": "1"}),  # one version, rename applied
    }
