"""Round 12: the three codec config knobs the r11 judge probe found
uncovered — CSV output-field-header (csv_encoder.go:40,
csv_decoder.go:63-80), canal-json content-compatible full-type mysqlType
(common/config.go:270-275, utils/mysql_types.go:25-33), and
debezium.output-old-value=false (codec.go:1039).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.types import ColumnSpec, mysql_full_type


# ---------------------------------------------------- full-type descriptor

# the reference's own expectation table, pkg/sink/codec/canal/type_test.go
# (GetMySQLType(columnInfo, true) rows) — every family
_FULL_TYPE_TABLE = [
    (ColumnSpec("c", "int"), "int(11)"),
    (ColumnSpec("c", "int", unsigned=True), "int(10) unsigned"),
    (
        ColumnSpec("c", "int", unsigned=True, zerofill=True),
        "int(10) unsigned zerofill",
    ),
    (ColumnSpec("c", "int", flen=10), "int(10)"),
    (ColumnSpec("c", "tinyint"), "tinyint(4)"),
    (ColumnSpec("c", "tinyint", unsigned=True), "tinyint(3) unsigned"),
    (ColumnSpec("c", "tinyint", flen=1), "tinyint(1)"),
    (ColumnSpec("c", "smallint"), "smallint(6)"),
    (ColumnSpec("c", "smallint", unsigned=True), "smallint(5) unsigned"),
    (ColumnSpec("c", "mediumint"), "mediumint(9)"),
    (ColumnSpec("c", "mediumint", unsigned=True), "mediumint(8) unsigned"),
    (ColumnSpec("c", "bigint"), "bigint(20)"),
    (ColumnSpec("c", "bigint", flen=19), "bigint(19)"),
    (
        ColumnSpec("c", "bigint", unsigned=True, zerofill=True),
        "bigint(20) unsigned zerofill",
    ),
    (ColumnSpec("c", "decimal"), "decimal(10,0)"),
    (ColumnSpec("c", "decimal", flen=5, decimal_digits=2), "decimal(5,2)"),
    (
        ColumnSpec("c", "decimal", unsigned=True, zerofill=True),
        "decimal(10,0) unsigned zerofill",
    ),
    (ColumnSpec("c", "float"), "float"),
    (ColumnSpec("c", "float", flen=10, decimal_digits=3), "float(10,3)"),
    (ColumnSpec("c", "float", unsigned=True), "float unsigned"),
    (ColumnSpec("c", "double"), "double"),
    (ColumnSpec("c", "double", flen=20, decimal_digits=3), "double(20,3)"),
    (ColumnSpec("c", "bit"), "bit(1)"),
    (ColumnSpec("c", "bit", flen=3), "bit(3)"),
    (ColumnSpec("c", "char", flen=123), "char(123)"),
    (ColumnSpec("c", "char"), "char(1)"),
    (ColumnSpec("c", "varchar", flen=123), "varchar(123)"),
    (ColumnSpec("c", "varchar", flen=23, binary=True), "varbinary(23)"),
    (ColumnSpec("c", "char", flen=1, binary=True), "binary(1)"),
    (ColumnSpec("c", "binary", flen=10), "binary(10)"),
    (ColumnSpec("c", "varbinary", flen=16), "varbinary(16)"),
    (ColumnSpec("c", "text"), "text"),
    (ColumnSpec("c", "mediumtext"), "mediumtext"),
    (ColumnSpec("c", "blob"), "blob"),
    (ColumnSpec("c", "longblob"), "longblob"),
    (ColumnSpec("c", "date"), "date"),
    (ColumnSpec("c", "datetime"), "datetime"),
    (ColumnSpec("c", "datetime", decimal_digits=3), "datetime(3)"),
    (ColumnSpec("c", "timestamp", decimal_digits=3), "timestamp(3)"),
    (ColumnSpec("c", "time"), "time"),
    (ColumnSpec("c", "time", decimal_digits=3), "time(3)"),
    (ColumnSpec("c", "year"), "year(4)"),
    (ColumnSpec("c", "json"), "json"),
    (
        ColumnSpec("c", "enum", enum_values=("a", "b", "c")),
        "enum('a','b','c')",
    ),
    (
        ColumnSpec("c", "set", enum_values=("a", "b", "c")),
        "set('a','b','c')",
    ),
]


def test_mysql_full_type_reference_table():
    for spec, expected in _FULL_TYPE_TABLE:
        assert spec.full_type() == expected, (spec, expected)


def test_mysql_full_type_varchar_needs_flen():
    with pytest.raises(ValueError, match="flen"):
        mysql_full_type({"mysqlType": "varchar"})


def test_java_sql_type_reference_map():
    """internal/java.go MySQLType2JavaType parity incl. the set→BIT(-7)
    and binary-charset→BLOB(2004) promotions."""
    from tiflow_spark.codecs.canal_json import _java_sql_type_of
    from tiflow_spark.types import table_schema

    schema = table_schema(
        [
            ColumnSpec("a", "set", enum_values=("x",)),
            ColumnSpec("b", "enum", enum_values=("x",)),
            ColumnSpec("c", "varchar", flen=8, binary=True),
            ColumnSpec("d", "text"),
            ColumnSpec("e", "smallint"),
            ColumnSpec("f", "float"),
            ColumnSpec("g", "datetime"),
            ColumnSpec("h", "year"),
            ColumnSpec("i", "decimal"),
        ]
    )
    got = [_java_sql_type_of(f) for f in schema.fields]
    assert got == [-7, 4, 2004, 2005, 5, 7, 93, 12, 3]


# ----------------------------------------------- canal content-compatible


def test_content_compatible_forces_updated_columns_and_full_types(spark):
    """config.go:272-274: content-compatible implies
    only-output-updated-columns; mysqlType carries the full descriptor."""
    from tiflow_spark.codecs.canal_json import encode_canal_json
    from tiflow_spark.types import table_schema

    payload = table_schema(
        [
            ColumnSpec("id", "bigint", primary_key=True),
            ColumnSpec("cnt", "int", unsigned=True),
            ColumnSpec("note", "varchar", flen=32),
        ]
    )
    env_schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
        ]
    )
    env = spark.createDataFrame(
        [("U", "s", "t", 1000, 1, (7, 1, "a"), (7, 2, "a"))], env_schema
    )
    msg = json.loads(
        encode_canal_json(env, content_compatible=True).collect()[0].value
    )
    assert msg["mysqlType"] == {
        "id": "bigint(20)",
        "cnt": "int(10) unsigned",
        "note": "varchar(32)",
    }
    # forced trim: only cnt changed → old image carries cnt alone
    assert msg["old"] == [{"cnt": "1"}]
    # and the default short form is untouched
    msg_short = json.loads(encode_canal_json(env).collect()[0].value)
    assert msg_short["mysqlType"]["cnt"] == "int unsigned"
    assert msg_short["old"] == [{"id": "7", "cnt": "1", "note": "a"}]


# ----------------------------------------------------- csv header knob


def test_csv_header_line_layout():
    from tiflow_spark.codecs.csv_codec import CsvConfig, csv_header_line

    cfg = CsvConfig(output_field_header=True)
    assert csv_header_line(["id", "v"], cfg) == (
        "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,"
        "ticdc-meta$commit-ts,id,v"
    )
    # commit-ts gated by IncludeCommitTs, is-update by OutputOldValue
    cfg2 = CsvConfig(
        include_commit_ts=False, output_old_value=True,
        output_field_header=True,
    )
    assert csv_header_line(["id"], cfg2) == (
        "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,"
        "ticdc-meta$is-update,id"
    )


def test_csv_decode_skips_and_validates_header(spark):
    from tiflow_spark.codecs.csv_codec import CsvConfig, decode_csv

    cfg = CsvConfig(output_field_header=True)
    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("note", T.StringType()),
        ]
    )
    good = spark.createDataFrame(
        [
            (
                "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,"
                "ticdc-meta$commit-ts,id,note",
            ),
            ('I,"t","s",1000,7,"x"',),
        ],
        "line string",
    )
    rows = decode_csv(good, payload, cfg).collect()
    assert len(rows) == 1 and rows[0].id == 7 and rows[0].note == "x"
    # a mismatched header (wrong column order) fails loudly —
    # csv_decoder.go:74-79's check-column-name panic
    bad = spark.createDataFrame(
        [
            (
                "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,"
                "ticdc-meta$commit-ts,note,id",
            ),
            ('I,"t","s",1000,7,"x"',),
        ],
        "line string",
    )
    with pytest.raises(Exception, match="header mismatch"):
        decode_csv(bad, payload, cfg).collect()


def test_storage_sink_header_mode_file_shape(spark, sf_dir, tmp_path):
    """Every CDC*.csv written in header mode starts with exactly the
    header line (csv_encoder.go:40: emitted before the first row), and
    the reader round-trips to the same decoded rows as headerless mode."""
    from tiflow_spark.codecs.csv_codec import CsvConfig, csv_header_line
    from tiflow_spark.plans.parity import _env
    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        read_storage_sink,
        write_storage_sink,
    )

    env = _env(spark, sf_dir)
    cfg = StorageSinkConfig(csv=CsvConfig(output_field_header=True))
    base = str(tmp_path / "hdr")
    files = write_storage_sink(env, base, cfg)
    assert files
    expected = csv_header_line(["id", "balance", "note"], cfg.csv)
    for rel in files:
        with open(os.path.join(base, rel)) as fh:
            first = fh.readline().rstrip("\n")
            rest = fh.read()
        assert first == expected, rel
        assert "ticdc-meta$operation," not in rest, (
            f"{rel}: header leaked past line 1"
        )
    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    dec = read_storage_sink(spark, base, payload, cfg)
    base2 = str(tmp_path / "plain")
    write_storage_sink(env, base2, StorageSinkConfig())
    dec2 = read_storage_sink(spark, base2, payload, StorageSinkConfig())
    cols = ["op", "table", "schema", "commit_ts", "id", "balance", "note"]
    assert sorted(map(tuple, dec.select(*cols).collect())) == sorted(
        map(tuple, dec2.select(*cols).collect())
    )


# ------------------------------------------- debezium output-old-value


def test_debezium_old_value_off_drops_before_key_only_on_updates(
    spark, sf_dir
):
    from tiflow_spark.codecs.debezium import encode_debezium
    from tiflow_spark.plans.parity import _env

    env = _env(spark, sf_dir)
    out = {
        r.op: json.loads(r.value)
        for r in encode_debezium(env, output_old_value=False)
        .join(env.select("seq", "op"), "seq")
        .select("op", "value")
        .collect()
    }
    assert "before" not in out["U"]["payload"]  # omitted, not null
    assert "after" in out["U"]["payload"]
    assert out["I"]["payload"]["before"] is None  # insert: explicit null
    assert out["D"]["payload"]["before"] is not None  # delete: pre-image
    # default keeps before on updates
    dflt = {
        r.op: json.loads(r.value)
        for r in encode_debezium(env)
        .join(env.select("seq", "op"), "seq")
        .select("op", "value")
        .collect()
    }
    assert dflt["U"]["payload"]["before"] is not None


# ------------------------------------------- tidb-extension probe (r12 #6)


def test_canal_json_tidb_extension_block(spark, sf_dir):
    """enable-tidb-extension=true: the DML message's LAST field is
    _tidb.commitTs with the EXACT commit ts (canal_json_row_event_
    encoder.go:252-257) — es stays ms-truncated; off-mode stays
    byte-identical to the plain JSONMessage."""
    from tiflow_spark.codecs.canal_json import encode_canal_json
    from tiflow_spark.plans.parity import _env

    env = _env(spark, sf_dir)
    row = encode_canal_json(env, enable_tidb_extension=True).first()
    msg = json.loads(row.value)
    assert msg["_tidb"] == {"commitTs": row.commit_ts}
    assert row.value.rstrip("}").endswith(str(row.commit_ts))  # last field
    off = encode_canal_json(env).first()
    assert "_tidb" not in json.loads(off.value)


def test_avro_no_extension_wire_shape():
    from tiflow_spark.codecs.avro import (
        decode_value_bytes,
        encode_value_bytes,
        schema_json,
    )

    on = encode_value_bytes(7, 1.5, "x", "I", 1000, 1)
    off = encode_value_bytes(7, 1.5, "x", "I", 1000, 1, False)
    assert len(off) < len(on)  # op + commit_ts really left the wire
    assert on.startswith(off)  # shared prefix: the row image
    d = decode_value_bytes(off, False)
    assert d == {"schema_id": 1, "id": 7, "balance": 1.5, "note": "x"}
    # trailing-bytes guard: feeding an extension message to the
    # no-extension reader must fail loudly, not silently truncate
    with pytest.raises(AssertionError, match="trailing"):
        decode_value_bytes(on, False)
    s = json.loads(schema_json("value_no_ext"))
    assert [f["name"] for f in s["fields"]] == ["id", "balance", "note"]


def test_open_only_updated_noop_without_old_value(spark, sf_dir):
    """The (b) probe finding pinned: open-protocol
    only-output-updated-columns is a structural NO-OP when
    output-old-value is off — dropNotUpdatedColumns only deletes from
    PreColumns, which is empty without OpenOutputOldValue
    (open_protocol_message.go:83-99, :149-151). Byte equality."""
    from tiflow_spark.codecs.open_protocol import encode_open_protocol
    from tiflow_spark.plans.parity import _env

    env = _env(spark, sf_dir)
    a = encode_open_protocol(
        env, output_old_value=False, only_output_updated_columns=True
    )
    b = encode_open_protocol(
        env, output_old_value=False, only_output_updated_columns=False
    )
    assert sorted(r.value for r in a.collect()) == sorted(
        r.value for r in b.collect()
    )


# --------------------------------------------------- terminator knob (r12)


def test_storage_sink_crlf_terminator_bytes(spark, sf_dir, tmp_path):
    """terminator="\\r\\n" (the reference default, pkg/config/sink.go:
    783-785): the data files really separate records with CRLF on disk,
    and the CRLF read path decodes to the same rows as the LF surface."""
    from tiflow_spark.plans.parity import _env
    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        read_storage_sink,
        write_storage_sink,
    )

    env = _env(spark, sf_dir)
    cfg = StorageSinkConfig(terminator="\r\n")
    base = str(tmp_path / "crlf")
    files = write_storage_sink(env, base, cfg)
    assert files
    raw = open(os.path.join(base, files[0]), "rb").read()
    assert b"\r\n" in raw
    assert raw.count(b"\n") == raw.count(b"\r\n")  # no bare-LF records
    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    dec = read_storage_sink(spark, base, payload, cfg)
    base2 = str(tmp_path / "lf")
    write_storage_sink(env, base2, StorageSinkConfig())
    dec2 = read_storage_sink(spark, base2, payload, StorageSinkConfig())
    cols = ["op", "table", "schema", "commit_ts", "id", "balance", "note"]
    assert sorted(map(tuple, dec.select(*cols).collect())) == sorted(
        map(tuple, dec2.select(*cols).collect())
    )


# ------------------------------------------------ filtered ANN (r12)


def test_filtered_ann_prefilter_semantics_and_plan(spark, sf_dir):
    """Pre-filter ANN: every neighbour shares the query's label; ranks
    are dense 1..k within the slice; and the candidate join is a
    broadcast equi-join on the category — never a cartesian product."""
    from tiflow_spark.llm.similarity import topk_cosine, topk_cosine_filtered
    from tiflow_spark.plans.parity import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_cosine_filtered(emb, [0, 1, 2, 3], k=5)
    rows = out.collect()
    labels = {r.vec_id: r.label for r in emb.selectExpr(
        "vec_id", "label").collect()}
    for r in rows:
        assert labels[r.vec_id] == r.cat  # neighbour inside the slice
        assert labels[r.query_id] == r.cat
    # plan: equi-join, no cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # pre-filter ≠ post-filtered global top-k: filtering the GLOBAL
    # top-5 by label must lose results for some query (the synthetic
    # labels are independent of cosine), while pre-filter always
    # returns k per query (slices are larger than k)
    glob = topk_cosine(emb, [0, 1, 2, 3], k=5).collect()
    post = [r for r in glob if labels[r.vec_id] == labels[r.query_id]]
    assert len(post) < len(rows)
    per_q = {r.query_id for r in rows}
    assert all(
        sum(1 for r in rows if r.query_id == q) == 5 for q in per_q
    )


# -------------------------------------- debezium typed values (r12)


def test_debezium_field_value_edges(spark):
    """writeDebeziumFieldValue edge semantics: BIT(n>1) bytes are
    LITTLE-endian and sized ceil(n/8) (codec.go:512-521); YEAR's
    two-digit pivots (<70 → +2000, <100 → +1900, codec.go:838-858);
    ZonedTimestamp's fraction is fsp-TRUNCATED, not rounded, and
    trailing zeros survive (codec.go:719-726)."""
    import base64

    from tiflow_spark.codecs.debezium import debezium_field_value

    df = spark.range(1).select(
        F.lit(0x0ABC).alias("bits"),
        F.lit(18).alias("y18"),
        F.lit(77).alias("y77"),
        F.lit(2024).alias("y4"),
        F.lit("2024-06-15 09:30:00.987654").alias("ts"),
        F.lit("2024-06-15 09:30:00").alias("ts0"),
    )
    row = df.select(
        debezium_field_value(
            F.col("bits"), {"mysqlType": "bit", "flen": 12}
        ).alias("b"),
        debezium_field_value(F.col("y18"), {"mysqlType": "year"}).alias(
            "a"
        ),
        debezium_field_value(F.col("y77"), {"mysqlType": "year"}).alias(
            "c"
        ),
        debezium_field_value(F.col("y4"), {"mysqlType": "year"}).alias(
            "d"
        ),
        debezium_field_value(
            F.col("ts"),
            {"mysqlType": "timestamp", "decimal": 3},
            tz="Asia/Shanghai",
        ).alias("z"),
        debezium_field_value(
            F.col("ts0"), {"mysqlType": "timestamp"}, tz="Asia/Shanghai"
        ).alias("z0"),
    ).collect()[0]
    assert base64.b64decode(row.b) == bytes([0xBC, 0x0A])  # little-endian
    assert (row.a, row.c, row.d) == (2018, 1977, 2024)
    # 09:30 Shanghai = 01:30Z; .987654 truncated to .987 at fsp=3
    assert row.z == "2024-06-15T01:30:00.987Z"
    assert row.z0 == "2024-06-15T01:30:00Z"
