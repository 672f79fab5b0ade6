"""Type-fidelity unit tests — SURVEY §1.2 matrix (mounter.go:772-841 rules).

Covers the hard conversions the reference's codec tests live on
(pkg/sink/codec/csv/csv_message_test.go, canal_json_*_test.go cases):
unsigned BIGINT overflow, enum/set name mapping, bit-as-int, NaN/Inf
coercion, decimal precision probes, binary-flag rendering, and a CSV
round-trip of a typed payload.
"""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from tiflow_spark.types import (
    ColumnSpec,
    coerce_invalid_float,
    decimal_fits,
    enum_name,
    set_names,
    table_schema,
    unsigned_bigint,
)


def test_unsigned_bigint_boundaries(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (-1,), (-(2**63),), (2**63 - 1,)], "v long"
    )
    got = {
        r.v: r.u
        for r in df.select(
            "v", unsigned_bigint(F.col("v")).cast("string").alias("u")
        ).collect()
    }
    assert got[0] == "0" and got[1] == "1"
    assert got[-1] == "18446744073709551615"  # max uint64
    assert got[-(2**63)] == "9223372036854775808"  # MaxInt64 + 1
    assert got[2**63 - 1] == "9223372036854775807"  # still in int64 range


def test_set_names_masks(spark):
    df = spark.createDataFrame([(0,), (1,), (3,), (6,), (7,)], "m long")
    got = {
        r.m: r.s
        for r in df.select(
            "m", set_names(F.col("m"), ("a", "b", "c")).alias("s")
        ).collect()
    }
    assert got == {0: "", 1: "a", 3: "a,b", 6: "b,c", 7: "a,b,c"}


def test_enum_name(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    got = [
        r.n
        for r in df.select(
            enum_name(F.col("v"), ("active", "inactive", "banned")).alias("n")
        ).collect()
    ]
    assert got == ["active", "inactive", "banned"]


def test_invalid_float_coercion(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),), (2.5,)], "v double"
    )
    got = [r.c for r in df.select(coerce_invalid_float(F.col("v")).alias("c")).collect()]
    assert got == [0.0, 0.0, 0.0, 2.5]


def test_decimal_fits_probe(spark):
    df = spark.createDataFrame(
        [("1" * 38,), ("1" * 39,), ("-" + "9" * 37 + ".5",)], "s string"
    )
    got = [r.f for r in df.select(decimal_fits(F.col("s")).alias("f")).collect()]
    assert got == [True, False, True]  # sign/point don't count as digits


def test_column_spec_schema_and_metadata():
    specs = [
        ColumnSpec("id", "bigint", primary_key=True),
        ColumnSpec("cnt", "bigint", unsigned=True),
        ColumnSpec("status", "enum", enum_values=("on", "off")),
        ColumnSpec("payload", "varchar", binary=True),
        ColumnSpec("note", "varchar", default="{}"),
    ]
    sch = table_schema(specs)
    assert sch["id"].metadata == {"mysqlType": "bigint", "pk": True}
    assert isinstance(sch["cnt"].dataType, T.DecimalType)
    assert sch["cnt"].dataType == T.DecimalType(20, 0)
    assert sch["status"].metadata["values"] == ["on", "off"]
    assert isinstance(sch["payload"].dataType, T.BinaryType)
    assert sch["note"].metadata["default"] == "{}"


def test_csv_roundtrip_typed_payload(spark):
    """Encode→decode equality on a payload using the §1.2 types: unsigned
    decimal, enum label, base64-rendered binary (the CSV codec's
    binary-encoding-method), doubles. Mirrors csv_message_test.go's
    typed cases."""
    from tiflow_spark.codecs.csv_codec import CsvConfig, decode_csv, encode_csv

    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ubig", T.DecimalType(20, 0)),
            T.StructField("status", T.StringType()),
            T.StructField("bin_b64", T.StringType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )
    from decimal import Decimal

    rows = [
        ("I", "s", "t", 1, 10,
         (1, Decimal(18446744073709551615), "active", None, 0.5)),
        ("U", "s", "t", 2, 11, (2, Decimal(0), 'quo"te', "aGVsbG8=", None)),
        ("D", "s", "t", 3, 12, None),
    ]
    env = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("schema", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("commit_ts", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("after", payload),
            ]
        ),
    ).withColumn(
        "before", F.when(F.col("op") == "D", F.col("after"))
    )
    # D encodes the before image; give the D row one
    env = env.withColumn(
        "before",
        F.when(
            F.col("op") == "D",
            F.struct(
                F.lit(3).cast("long").alias("id"),
                F.lit(7).cast("decimal(20,0)").alias("ubig"),
                F.lit("banned").alias("status"),
                F.lit(None).cast("string").alias("bin_b64"),
                F.lit(1.5).alias("ratio"),
            ),
        ),
    )
    cfg = CsvConfig()
    lines = encode_csv(env, cfg)
    decoded = decode_csv(lines, payload, cfg)
    got = {r.id: r for r in decoded.collect()}
    assert got[1].ubig == 18446744073709551615 and got[1].status == "active"
    assert got[2].status == 'quo"te' and got[2].bin_b64 == "aGVsbG8="
    assert got[2].ratio is None
    assert got[3].op == "D" and got[3].ubig == 7


def test_canal_json_renders_typed_mysql_types(spark):
    """Canal-JSON mysqlType/sqlType maps must honor ColumnSpec metadata
    (enum value lists, unsigned, binary) — canal_json_message.go
    getMySQLType / JavaSQLType parity for the §1.2 types."""
    import json

    from tiflow_spark.codecs.canal_json import encode_canal_json
    from tiflow_spark.types import ColumnSpec, table_schema

    payload = table_schema(
        [
            ColumnSpec("id", "bigint", primary_key=True),
            ColumnSpec("cnt", "bigint", unsigned=True),
            ColumnSpec("status", "enum", enum_values=("on", "off")),
            ColumnSpec("payload", "blob", binary=True),
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
    from decimal import Decimal

    env = spark.createDataFrame(
        [("I", "s", "t", 1000, 1, None, (7, Decimal(5), 1, b"\x01\x02"))],
        env_schema,
    )
    out = encode_canal_json(env).collect()[0]
    msg = json.loads(out.value)
    assert msg["mysqlType"] == {
        "id": "bigint",
        "cnt": "bigint unsigned",
        "status": "enum('on','off')",
        "payload": "blob",
    }
    # cnt is unsigned bigint with value 5 ≤ MaxInt64: the reference
    # promotes to DECIMAL(3) PER VALUE only on overflow
    # (canal_entry.go getJavaSQLType :360-363, fixed per ADVICE r12 —
    # the old per-column pin of 3 certified bytes the reference would
    # emit as -5); both branches are pinned in tests/test_round13.py.
    assert msg["sqlType"] == {"id": -5, "cnt": -5, "status": 4, "payload": 2004}
    assert msg["data"][0]["id"] == "7"
