"""PK/UK/handle-key + partition-DDL + generated-column metadata plumbing.

Round-5 closure of the last fixture residue: key metadata parsed from DDL
flows through the registry into schema.json, handle-key dispatch, and the
partition directory — no positional or name heuristics anywhere.

Reference behaviors mirrored:
- ColumnFlagType PK/UK/handle flags (cdc/model/sink.go:62-205)
- TableDefinition ColumnIsPk from table info
  (pkg/sink/cloudstorage/table_definition.go)
- partition DDL directory updates (tests/integration_tests/partition_table)
- generated columns (pkg/filter/expr_filter.go:251-382 getGenerateExpr)
"""

import json

import pyspark.sql.functions as F

from tiflow_spark.sources.ddl_parse import parse_ddl
from tiflow_spark.sources.ddl_stream import registry_from_ddl

# ------------------------------------------------------------ parser units


def test_parse_add_drop_primary_key_and_unique():
    op = parse_ddl("ALTER TABLE t ADD PRIMARY KEY (a, b)")
    assert op.kind == "add primary key"
    assert op.pk_columns == ("a", "b")
    op = parse_ddl("ALTER TABLE t DROP PRIMARY KEY")
    assert op.kind == "drop primary key"
    op = parse_ddl("ALTER TABLE t ADD UNIQUE KEY uq_ab (a, b(10))")
    assert op.kind == "create index"
    assert op.unique_keys == (("a", "b"),)
    assert op.key_name == "uq_ab"
    op = parse_ddl("ALTER TABLE t DROP INDEX uq_ab")
    assert (op.kind, op.key_name) == ("drop index", "uq_ab")


def test_parse_create_drop_index_statements():
    op = parse_ddl("CREATE UNIQUE INDEX uq_x ON db.t (x)")
    assert op.kind == "create index"
    assert (op.schema, op.table) == ("db", "t")
    assert op.unique_keys == (("x",),)
    assert op.key_name == "uq_x"
    op = parse_ddl("CREATE INDEX ix_y ON t (y)")
    assert op.unique_keys == ()  # non-unique: decode-neutral
    op = parse_ddl("DROP INDEX uq_x ON t")
    assert (op.kind, op.key_name) == ("drop index", "uq_x")


def test_parse_table_level_unique_key_names():
    op = parse_ddl(
        "CREATE TABLE t (a BIGINT, b VARCHAR, PRIMARY KEY (b), "
        "UNIQUE KEY uq_a (a))"
    )
    assert op.pk_columns == ("b",)
    assert op.unique_keys == (("a",),)
    assert op.unique_key_names == ("uq_a",)


def test_parse_partition_actions():
    op = parse_ddl(
        "ALTER TABLE t ADD PARTITION (PARTITION p9 VALUES LESS THAN (100))"
    )
    assert (op.kind, op.partition_name) == ("add table partition", "p9")
    op = parse_ddl("ALTER TABLE t DROP PARTITION p1")
    assert (op.kind, op.partition_name) == ("drop table partition", "p1")
    op = parse_ddl("ALTER TABLE t TRUNCATE PARTITION p2")
    assert (op.kind, op.partition_name) == ("truncate table partition", "p2")
    op = parse_ddl("ALTER TABLE t EXCHANGE PARTITION p3 WITH TABLE other")
    assert op.kind == "exchange table partition"
    assert (op.partition_name, op.exchange_table) == ("p3", "other")


def test_parse_generated_columns():
    op = parse_ddl(
        "CREATE TABLE t (a DOUBLE, c BIGINT GENERATED ALWAYS AS "
        "(CAST(round(a * 100, 0) AS BIGINT)) STORED, "
        "v INT AS (CASE WHEN a < 0 THEN 1 ELSE 0 END))"
    )
    cols = {c.name: c for c in op.columns}
    assert cols["c"].generated_expr == "CAST(round(a * 100, 0) AS BIGINT)"
    assert cols["c"].stored is True
    assert cols["v"].generated_expr == "CASE WHEN a < 0 THEN 1 ELSE 0 END"
    assert cols["v"].stored is False  # MySQL default: VIRTUAL
    assert cols["c"].default is None  # generated ⇒ no DEFAULT parse


# ------------------------------------------------------------ registry fold


def _ddl(spark, rows):
    return spark.createDataFrame(
        [("DDL", "s0", t, ts, i, k, q) for i, (ts, t, k, q) in enumerate(rows)],
        "op string, schema string, table string, commit_ts long, seq long, "
        "ddl_type string, query string",
    )


def test_registry_key_fold(spark):
    reg = registry_from_ddl(
        _ddl(
            spark,
            [
                (10, "t", "create table",
                 "CREATE TABLE t (a BIGINT, b VARCHAR, c DOUBLE, "
                 "PRIMARY KEY (b), UNIQUE KEY uq_a (a))"),
                (20, "t", "drop primary key",
                 "ALTER TABLE t DROP PRIMARY KEY"),
                (30, "t", "create index",
                 "CREATE INDEX ix_c ON t (c)"),  # non-unique: NO version
                (40, "t", "add primary key",
                 "ALTER TABLE t ADD PRIMARY KEY (a, b)"),
                (50, "t", "drop column",
                 "ALTER TABLE t DROP COLUMN b"),  # pk shrinks to (a)
            ],
        )
    )
    rows = {r["version_ts"]: r for r in reg.collect()}
    assert sorted(rows) == [10, 20, 40, 50]  # ix_c emitted nothing
    assert list(rows[10]["pk_cols"]) == ["b"]
    assert list(rows[10]["handle_cols"]) == ["b"]
    assert list(rows[20]["pk_cols"]) == []
    assert list(rows[20]["handle_cols"]) == ["a"]  # falls to first UK
    assert list(rows[40]["pk_cols"]) == ["a", "b"]
    assert list(rows[50]["pk_cols"]) == ["a"]
    assert [list(u) for u in rows[50]["uk_sets"]] == [["a"]]


def test_registry_generated_fold(spark):
    reg = registry_from_ddl(
        _ddl(
            spark,
            [
                (10, "t", "create table",
                 "CREATE TABLE t (a DOUBLE, c BIGINT GENERATED ALWAYS AS "
                 "(CAST(a * 100 AS BIGINT)) STORED)"),
                (20, "t", "modify column",
                 "ALTER TABLE t MODIFY COLUMN c BIGINT GENERATED ALWAYS AS "
                 "(CAST(a * 1000 AS BIGINT)) STORED"),
                (30, "t", "modify column",
                 "ALTER TABLE t MODIFY COLUMN c BIGINT"),  # de-generates
            ],
        )
    )
    rows = sorted(reg.collect(), key=lambda r: r["version_no"])
    assert rows[0]["gen_exprs"] == {"c": "CAST(a * 100 AS BIGINT)"}
    assert list(rows[0]["gen_stored"]) == ["c"]
    assert rows[1]["gen_exprs"] == {"c": "CAST(a * 1000 AS BIGINT)"}
    assert rows[2]["gen_exprs"] == {}


def test_schema_json_pk_from_registry(spark, tmp_path):
    """schema.json ColumnIsPk comes from DDL key metadata — a pk that is
    neither first nor named `id` is correctly flagged, nothing else is."""
    from tiflow_spark.sinks.storage import write_ddl_schema_versions

    reg = registry_from_ddl(
        _ddl(
            spark,
            [
                (10, "acct", "create table",
                 "CREATE TABLE acct (seqno BIGINT, acct_no VARCHAR, "
                 "bal DOUBLE, PRIMARY KEY (acct_no))"),
            ],
        )
    )
    paths = write_ddl_schema_versions(reg, str(tmp_path / "sink"))
    defn = json.load(open(paths[0]))
    flags = {
        c["ColumnName"]: (c["ColumnIsPk"], c["ColumnNullable"])
        for c in defn["TableColumns"]
    }
    assert flags["acct_no"] == ("true", "false")
    assert flags["seqno"] == ("false", "true")
    assert flags["bal"] == ("false", "true")


# ----------------------------------------------------- partition directory


def test_partition_directory_fold(spark):
    from tiflow_spark.operators.partition_table import (
        LONG_MIN,
        partition_directory_from_ddl,
    )

    base = spark.createDataFrame(
        [(100, "s0", "t", "p0"), (101, "s0", "t", "p1")],
        "physical_table_id long, logical_schema string, "
        "logical_table string, partition_name string",
    )
    ddl = _ddl(
        spark,
        [
            (10, "t", "add table partition",
             "ALTER TABLE t ADD PARTITION (PARTITION p2 VALUES LESS THAN (9))"),
            (20, "t", "truncate table partition",
             "ALTER TABLE t TRUNCATE PARTITION p0"),
            (30, "t", "exchange table partition",
             "ALTER TABLE t EXCHANGE PARTITION p1 WITH TABLE ext"),
            (40, "t", "drop table partition",
             "ALTER TABLE t DROP PARTITION p2"),
        ],
    )
    pdir = partition_directory_from_ddl(base, ddl, table_ids={"ext": 900})
    rows = {(r["version_ts"], r["physical_table_id"]): r for r in pdir.collect()}
    # base
    assert rows[(LONG_MIN, 100)]["partition_name"] == "p0"
    # add: fresh id minted ABOVE the standalone ext id too (901, not 102 —
    # a 102 mint could collide with ids passed via table_ids)
    assert rows[(10, 901)]["partition_name"] == "p2"
    # truncate p0: 100 tombstoned, fresh id 902
    assert rows[(20, 100)]["logical_table"] is None
    assert rows[(20, 902)]["partition_name"] == "p0"
    # exchange p1<->ext: 101 tombstoned, 900 becomes p1
    assert rows[(30, 101)]["logical_table"] is None
    assert rows[(30, 900)]["partition_name"] == "p1"
    # drop p2: 901 tombstoned
    assert rows[(40, 901)]["logical_table"] is None


# --------------------------------------------------- handle-key fallback


def test_rekey_null_when_no_handle(spark):
    """A version with no PK and no UK yields a NULL key — the caller's
    signal to fall back to force-replicate full-row keying."""
    from tiflow_spark.operators.transforms import rekey_by_handle
    from tiflow_spark.sources.schema_registry import asof_resolve

    reg = registry_from_ddl(
        _ddl(
            spark,
            [(10, "t", "create table", "CREATE TABLE t (a BIGINT, b VARCHAR)")],
        )
    )
    env = spark.createDataFrame(
        [(100, 1, "x")],
        "commit_ts long, seq long, note string",
    ).select(
        "commit_ts",
        "seq",
        F.lit("t").alias("logical_table"),
        F.struct(F.lit(1).alias("a"), F.col("note").alias("b")).alias("after"),
        F.lit(None).cast("struct<a:long,b:string>").alias("before"),
    )
    out = rekey_by_handle(asof_resolve(env, reg, with_keys=True))
    assert out.select("key").first()["key"] is None


def test_keys_survive_change_and_rename(spark):
    """CHANGE COLUMN renames flow through pk/uk metadata and RENAME TABLE
    carries the whole key lineage — the interaction surface of the r5
    key fold (schema_storage lineage continuity + ColumnFlagType)."""
    reg = registry_from_ddl(
        _ddl(
            spark,
            [
                (10, "t", "create table",
                 "CREATE TABLE t (a BIGINT, b VARCHAR, PRIMARY KEY (b), "
                 "UNIQUE KEY uq_a (a))"),
                (20, "t", "modify column",
                 "ALTER TABLE t CHANGE COLUMN b b2 VARCHAR"),
                (30, "t", "rename table", "RENAME TABLE t TO t2"),
                (40, "t2", "add column",
                 "ALTER TABLE t2 ADD COLUMN c INT DEFAULT '7'"),
            ],
        )
    )
    rows = sorted(reg.collect(), key=lambda r: r["version_no"])
    assert [r["table"] for r in rows] == ["t", "t", "t2", "t2"]
    assert list(rows[1]["pk_cols"]) == ["b2"]  # CHANGE renamed the pk col
    assert list(rows[3]["pk_cols"]) == ["b2"]  # lineage continues under t2
    assert [list(u) for u in rows[3]["uk_sets"]] == [["a"]]
    assert list(rows[3]["handle_cols"]) == ["b2"]


def test_current_timestamp_default_backfill(spark):
    """DEFAULT CURRENT_TIMESTAMP backfills pre-existing rows with the
    ADD COLUMN DDL's own commit time — the deterministic stand-in for the
    reference's evaluate-at-decode clock (ddl_default_current_timestamp
    scenario); a plain literal default still backfills verbatim."""
    from tiflow_spark.sources.schema_registry import (
        asof_resolve,
        decode_with_schema,
    )

    reg = registry_from_ddl(
        _ddl(
            spark,
            [
                (1_000_000, "t", "create table",
                 "CREATE TABLE t (a BIGINT PRIMARY KEY)"),
                (2_000_000, "t", "add column",
                 "ALTER TABLE t ADD COLUMN created_at DATETIME "
                 "DEFAULT CURRENT_TIMESTAMP"),
            ],
        )
    )
    env = spark.createDataFrame(
        [(1_500_000, 1), (2_500_000, 2)], "commit_ts long, seq long"
    ).select(
        "commit_ts",
        "seq",
        F.lit("t").alias("logical_table"),
        F.struct(F.col("seq").alias("a")).alias("after"),
    )
    dec = decode_with_schema(asof_resolve(env, reg), reg)
    rows = {r["seq"]: r for r in dec.collect()}
    # pre-DDL row: version 1, created_at not yet defined -> NULL
    assert rows[1]["created_at_resolved"] is None
    # post-DDL row: column absent from payload -> DDL commit time
    got = rows[2]["created_at_resolved"]
    import datetime

    assert got == datetime.datetime.fromtimestamp(2.0)  # 2_000_000 us
