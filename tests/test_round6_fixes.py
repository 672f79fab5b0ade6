"""Round-6 ADVICE regressions: maxwell partition-DDL classification,
lossy-modify cross-family shrinks, partition-id minting vs standalone ids,
unnamed-unique-key default names."""

import json

import pyspark.sql.functions as F


def _ddl_frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, schema string, table string, commit_ts long, seq long, "
        "ddl_type string, query string",
    )


def test_maxwell_partition_ddl_is_table_alter(spark):
    """'drop table partition' must encode as table-alter, not table-drop —
    the reference maps ALL partition DDL into table-alter
    (maxwell_message.go ddlToMaxwellType, ActionAddColumn..
    ActionDropTablePartition); a prefix match on 'drop table' would tell a
    Maxwell consumer to drop the whole table on a partition drop."""
    from tiflow_spark.codecs.maxwell import encode_maxwell_ddl

    ddl = _ddl_frame(
        spark,
        [
            ("DDL", "s", "t", 1_000_000, 1, "drop table partition",
             "ALTER TABLE t DROP PARTITION p0"),
            ("DDL", "s", "t", 2_000_000, 2, "add table partition",
             "ALTER TABLE t ADD PARTITION (PARTITION p9 VALUES LESS THAN (9))"),
            ("DDL", "s", "t", 3_000_000, 3, "truncate table partition",
             "ALTER TABLE t TRUNCATE PARTITION p1"),
            ("DDL", "s", "t", 4_000_000, 4, "drop table", "DROP TABLE t"),
            ("DDL", "s", "t2", 5_000_000, 5, "create table",
             "CREATE TABLE t2 (id BIGINT)"),
        ],
    )
    rows = encode_maxwell_ddl(ddl).orderBy("seq").collect()
    types = [json.loads(r["value"])["type"] for r in rows]
    assert types == [
        "table-alter", "table-alter", "table-alter",
        "table-drop", "table-create",
    ]


def test_lossy_modify_cross_family_shrinks():
    from tiflow_spark.sources.ddl_stream import is_lossy_modify

    assert is_lossy_modify("VARCHAR(64)", "CHAR(8)") == \
        "length or precision reduced"
    assert is_lossy_modify("TEXT", "VARCHAR(8)") == \
        "length or precision reduced"
    assert is_lossy_modify("CHAR(4)", "VARCHAR(64)") is None
    assert is_lossy_modify("VARCHAR(100)", "TEXT") is None
    assert is_lossy_modify("BIGINT", "VARCHAR(2)") == \
        "string too short for numeric range"
    assert is_lossy_modify("BIGINT", "VARCHAR(20)") is None
    assert is_lossy_modify("DECIMAL(12,4)", "VARCHAR(8)") == \
        "string too short for numeric range"
    assert is_lossy_modify("DECIMAL(12,4)", "VARCHAR(14)") is None


def test_partition_mint_skips_standalone_ids(spark):
    """ADD/TRUNCATE PARTITION mint fresh physical ids ABOVE both the base
    partition ids and any standalone-table ids: with base max 101 and
    staging=900, a minted pid of 102 would collide with nothing today but
    900 is live in the same directory namespace — mint 901."""
    from tiflow_spark.operators.partition_table import (
        partition_directory_from_ddl,
    )

    base = spark.createDataFrame(
        [(100, "s", "t", "p0"), (101, "s", "t", "p1")],
        "physical_table_id long, logical_schema string, "
        "logical_table string, partition_name string",
    )
    ddl = _ddl_frame(
        spark,
        [
            ("DDL", "s", "t", 1_000_000, 1, "add table partition",
             "ALTER TABLE t ADD PARTITION (PARTITION p2 VALUES LESS THAN (9))"),
            ("DDL", "s", "t", 2_000_000, 2, "truncate table partition",
             "ALTER TABLE t TRUNCATE PARTITION p0"),
        ],
    )
    pdir = partition_directory_from_ddl(base, ddl, table_ids={"staging": 900})
    live = {
        r["partition_name"]: r["physical_table_id"]
        for r in pdir.collect()
        if r["logical_table"] is not None and r["version_ts"] > -(2**62)
    }
    assert live["p2"] == 901
    assert live["p0"] == 902
    assert 900 not in live.values()


def test_unnamed_unique_key_droppable_by_default_name(spark):
    """Inline `col UNIQUE` / unnamed UNIQUE(...) keys get MySQL default
    index names (first column, numeric suffix on collision), so DROP INDEX
    by that name removes them instead of leaving stale uk state driving
    the handle key."""
    from tiflow_spark.sources.ddl_stream import registry_from_ddl

    ddl = _ddl_frame(
        spark,
        [
            ("DDL", "s", "t", 1_000_000, 1, "create table",
             "CREATE TABLE t (a BIGINT, b BIGINT UNIQUE, c BIGINT)"),
            ("DDL", "s", "t", 2_000_000, 2, "create index",
             "CREATE UNIQUE INDEX c_idx ON t (c)"),
            ("DDL", "s", "t", 3_000_000, 3, "drop index",
             "DROP INDEX b ON t"),
        ],
    )
    reg = registry_from_ddl(ddl).orderBy("version_ts").collect()
    # after create table: uk over b drives the handle key
    assert reg[0]["uk_sets"] == [["b"]]
    assert reg[0]["handle_cols"] == ["b"]
    # after DROP INDEX b (the synthesized default name): only c_idx remains
    assert reg[-1]["uk_sets"] == [["c"]]
    assert reg[-1]["handle_cols"] == ["c"]


def test_debezium_ddl_roundtrip_and_edges(spark):
    """Debezium schema-change encode→decode round-trip (decoder.go:97: a
    value payload without "op" is DDL; NextDDLEvent reads databaseName /
    table / ddl / commit_ts), plus the reference's edge cases: TRUNCATE
    emits an empty tableChanges array, DROP TABLE emits table=null,
    partition DDL is ALTER (never DROP)."""
    import pyspark.sql.functions as F

    from tiflow_spark.codecs.debezium import (
        decode_debezium_ddl,
        encode_debezium_ddl,
    )

    ddl = _ddl_frame(
        spark,
        [
            ("DDL", "s", "t", 1_000_000, 1, "truncate table",
             "TRUNCATE TABLE t"),
            ("DDL", "s", "t", 2_000_000, 2, "drop table", "DROP TABLE t"),
            ("DDL", "s", "t", 3_000_000, 3, "drop table partition",
             "ALTER TABLE t DROP PARTITION p0"),
            ("DDL", "s", "t", 4_000_000, 4, "add column",
             "ALTER TABLE t ADD COLUMN x INT"),
        ],
    )
    enc = encode_debezium_ddl(ddl)
    rows = {r["seq"]: json.loads(r["value"]) for r in enc.collect()}
    assert rows[1]["payload"]["tableChanges"] == []
    assert rows[2]["payload"]["tableChanges"][0]["type"] == "DROP"
    assert rows[2]["payload"]["tableChanges"][0]["table"] is None
    assert rows[3]["payload"]["tableChanges"][0]["type"] == "ALTER"
    assert rows[4]["payload"]["source"]["commit_ts"] == 4_000_000
    # no "op" key anywhere in the payload → consumers route it as DDL
    assert "op" not in rows[4]["payload"]
    dec = decode_debezium_ddl(enc).orderBy("commit_ts").collect()
    assert [r["query"] for r in dec] == [
        "TRUNCATE TABLE t", "DROP TABLE t",
        "ALTER TABLE t DROP PARTITION p0",
        "ALTER TABLE t ADD COLUMN x INT",
    ]
    assert all(r["schema"] == "s" for r in dec)


def test_simple_ddl_roundtrip(spark):
    """Simple-protocol DDL: pre/post TableSchema track the registry fold
    (create → null pre; add column → pre has one fewer column), and the
    decoder recovers sql/commitTs/schema/columns."""
    from tiflow_spark.codecs.simple import decode_simple_ddl, encode_simple_ddl
    from tiflow_spark.sources.ddl_stream import registry_from_ddl

    ddl = _ddl_frame(
        spark,
        [
            ("DDL", "s", "t", 1_000_000, 1, "create table",
             "CREATE TABLE t (id BIGINT PRIMARY KEY, v DOUBLE)"),
            ("DDL", "s", "t", 2_000_000, 2, "add column",
             "ALTER TABLE t ADD COLUMN note VARCHAR"),
        ],
    )
    reg = registry_from_ddl(ddl)
    enc = encode_simple_ddl(ddl, reg)
    rows = {r["seq"]: json.loads(r["value"]) for r in enc.collect()}
    assert rows[1]["type"] == "CREATE"
    assert rows[1]["preTableSchema"] is None
    assert [c["name"] for c in rows[1]["tableSchema"]["columns"]] == ["id", "v"]
    assert rows[1]["tableSchema"]["indexes"][0]["columns"] == ["id"]
    assert rows[2]["type"] == "ALTER"
    assert [c["name"] for c in rows[2]["tableSchema"]["columns"]] == [
        "id", "v", "note"]
    assert [c["name"] for c in rows[2]["preTableSchema"]["columns"]] == [
        "id", "v"]
    dec = decode_simple_ddl(enc).orderBy("commit_ts").collect()
    assert dec[0]["columns"] == ["id", "v"]
    assert dec[1]["columns"] == ["id", "v", "note"]
    assert dec[1]["query"] == "ALTER TABLE t ADD COLUMN note VARCHAR"


def test_checkpoint_messages_consumer_routing(spark):
    """Every protocol's resolved-ts message must be classifiable by its
    consumer and round-trip the exact ts: canal-json type TIDB_WATERMARK
    + _tidb.watermarkTs, open-protocol key t=3 with an EMPTY value,
    simple type WATERMARK + commitTs, Debezium op='m' +
    source.commit_ts."""
    from tiflow_spark.codecs.canal_json import encode_canal_json_checkpoint
    from tiflow_spark.codecs.debezium import encode_debezium_checkpoint
    from tiflow_spark.codecs.open_protocol import (
        encode_open_protocol_checkpoint,
    )
    from tiflow_spark.codecs.simple import encode_simple_checkpoint

    f = spark.createDataFrame(
        [(1_700_000_123_456_789,), (1_700_000_999_999_999,)],
        "resolved_ts long",
    )
    want = {1_700_000_123_456_789, 1_700_000_999_999_999}

    canal = {
        (json.loads(r["value"])["type"],
         json.loads(r["value"])["_tidb"]["watermarkTs"])
        for r in encode_canal_json_checkpoint(f).collect()
    }
    assert canal == {("TIDB_WATERMARK", ts) for ts in want}

    op = encode_open_protocol_checkpoint(f).collect()
    assert {json.loads(r["key"])["t"] for r in op} == {3}
    assert {json.loads(r["key"])["ts"] for r in op} == want
    assert all(r["value"] == "" for r in op)

    simple = {
        (json.loads(r["value"])["type"], json.loads(r["value"])["commitTs"])
        for r in encode_simple_checkpoint(f).collect()
    }
    assert simple == {("WATERMARK", ts) for ts in want}

    dbz = encode_debezium_checkpoint(f).collect()
    payloads = [json.loads(r["value"])["payload"] for r in dbz]
    # op 'm' is what decoder.go:99-104 routes to MessageTypeResolved
    assert {p["op"] for p in payloads} == {"m"}
    assert {p["source"]["commit_ts"] for p in payloads} == want
    assert all(json.loads(r["key"]) == {"payload": {}} for r in dbz)


def test_avro_watermark_envelope_roundtrip(spark):
    """Avro watermark-mode envelope: 0x01+json DDL frames and 0x02+BE-ts
    resolved frames decode back to the exact inputs (avro.go:256-303)."""
    from tiflow_spark.codecs.avro import (
        decode_avro_watermark_events,
        encode_avro_watermark_events,
    )

    ddl = _ddl_frame(
        spark,
        [("DDL", "s", "t", 1_700_000_123_456_789, 1, "add column",
          "ALTER TABLE t ADD COLUMN x INT")],
    )
    resolved = spark.createDataFrame(
        [(1_700_000_999_999_999,)], "resolved_ts long"
    )
    enc = encode_avro_watermark_events(ddl=ddl, resolved=resolved)
    dec = decode_avro_watermark_events(enc).collect()
    by_kind = {r["kind"]: r for r in dec}
    assert by_kind["resolved"]["resolved_ts"] == 1_700_000_999_999_999
    d = by_kind["ddl"]["ddl"]
    assert d["query"] == "ALTER TABLE t ADD COLUMN x INT"
    assert d["commitTs"] == 1_700_000_123_456_789
    assert d["schema"] == "s" and d["table"] == "t"
    assert d["type"] == 5  # ActionAddColumn
