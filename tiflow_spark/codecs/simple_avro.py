"""Simple protocol — ``encoding-format=avro`` wire variant.

Reference: pkg/sink/codec/simple/avro.go (newDMLMessageMap :245-316,
collectColumns :360-380, newMessageFromAvroNative :468-540,
newTableSchemaMap :26-133) + the embedded union schema
pkg/sink/codec/simple/message.json. With ``encoding-format=avro`` the
simple protocol marshals the SAME message struct as the JSON form but as
plain Avro binary of the compiled-in schema (marshaller.go:44-55 →
goavro ``BinaryFromNative``) — no Confluent registry header; consumers
carry the schema statically.

Wire layout per the Avro binary spec driven by message.json:

- ``Message`` = MessageType enum (zigzag symbol index: WATERMARK=0,
  BOOTSTRAP=1, DDL=2, DML=3) + payload union branch (zigzag: Watermark=0,
  Bootstrap=1, DDL=2, DML=3) + the record body.
- ``DML`` fields in schema order (message.json:306-418): version int,
  database string, table string, tableID long, DMLType enum
  (INSERT=0/UPDATE=1/DELETE=2), commitTs long, buildTs long,
  schemaVersion long, claimCheckLocation union[null,string],
  handleKeyOnly union[null,boolean], checksum union[null,Checksum],
  data union[null,map], old union[null,map].
- image maps: one block (zigzag entry count) of key + value-union
  entries, then a zero terminator. Value-union branches (message.json
  :382-391): null=0 long=1 float=2 double=3 string=4 bytes=5
  Timestamp=6 UnsignedBigint=7, assigned by encodeValue4Avro
  (message.go:605-648: signed ints → long, float32 → float, float64 →
  double, []byte → bytes iff binary-flagged else string, timestamp →
  Timestamp{location,value}, unsigned bigint → UnsignedBigint{value}).
- ``Watermark`` = version int + commitTs long + buildTs long
  (avro.go:135-154).
- ``Bootstrap`` = version int + buildTs long + TableSchema
  (avro.go:156-176); TableSchema = database, table, tableID, version,
  columns array<ColumnSchema>, indexes array<IndexSchema>
  (newTableSchemaMap) with ColumnSchema = name + DataType{mysqlType,
  charset, collate, length, decimal?, elements?, unsigned?, zerofill?}
  + nullable + default union[null,string].

Determinism divergences (shared with the JSON marshaller in simple.py):
buildTs (wall clock in the reference) pinned to 0; image-map entries
emitted in schema column order — goavro ranges Go maps in randomized
order, so the reference's own map-entry BYTE order is nondeterministic
and only the decoded native is contractual (we pin a canonical order so
the wire is replayable byte-identically).

Encoding runs in Arrow-batched pandas UDFs over pure-Python writers —
the same shape as the Confluent-wire codec in codecs/avro.py; the hot
path stays vectorized per batch and the messages are opaque binary to
Spark either way.
"""

from __future__ import annotations

import io
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from tiflow_spark.codecs.avro import _read_zigzag, _zigzag

VERSION = 1

MESSAGE_TYPES = ("WATERMARK", "BOOTSTRAP", "DDL", "DML")
DML_TYPES = ("INSERT", "UPDATE", "DELETE")
# value-union branch order, message.json:382-391
_V_NULL, _V_LONG, _V_FLOAT, _V_DOUBLE, _V_STRING, _V_BYTES = range(6)
_V_TIMESTAMP, _V_UNSIGNED = 6, 7


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _dec_str(buf: io.BytesIO) -> str:
    n = _read_zigzag(buf)
    raw = buf.read(n)
    if len(raw) != n:
        raise ValueError("simple-avro: truncated string")
    return raw.decode("utf-8")


def _enc_value(kind: str, v) -> bytes:
    """One image-map value as its union branch (encodeValue4Avro)."""
    if v is None:
        return _zigzag(_V_NULL)
    if kind == "long":
        return _zigzag(_V_LONG) + _zigzag(int(v))
    if kind == "float":
        return _zigzag(_V_FLOAT) + struct.pack("<f", float(v))
    if kind == "double":
        return _zigzag(_V_DOUBLE) + struct.pack("<d", float(v))
    if kind == "string":
        return _zigzag(_V_STRING) + _enc_str(str(v))
    if kind == "bytes":
        return _zigzag(_V_BYTES) + _zigzag(len(v)) + bytes(v)
    if kind == "timestamp":  # Timestamp{location, value}
        loc, val = v
        return _zigzag(_V_TIMESTAMP) + _enc_str(loc) + _enc_str(val)
    if kind == "unsigned":  # UnsignedBigint{value} — int64 reinterpret
        return _zigzag(_V_UNSIGNED) + _zigzag(int(v))
    raise ValueError(f"simple-avro: unknown value kind {kind!r}")


def _dec_value(buf: io.BytesIO):
    branch = _read_zigzag(buf)
    if branch == _V_NULL:
        return None
    if branch == _V_LONG:
        return _read_zigzag(buf)
    if branch == _V_FLOAT:
        return struct.unpack("<f", buf.read(4))[0]
    if branch == _V_DOUBLE:
        return struct.unpack("<d", buf.read(8))[0]
    if branch == _V_STRING:
        return _dec_str(buf)
    if branch == _V_BYTES:
        return buf.read(_read_zigzag(buf))
    if branch == _V_TIMESTAMP:
        return {"location": _dec_str(buf), "value": _dec_str(buf)}
    if branch == _V_UNSIGNED:
        return _read_zigzag(buf)
    raise ValueError(f"simple-avro: bad value-union branch {branch}")


def _enc_map(entries) -> bytes:
    """entries: list[(name, kind, value)] → one avro map block + end
    (an empty map is the bare zero terminator — no 0-count block)."""
    out = b""
    if entries:
        out = _zigzag(len(entries))
        for name, kind, v in entries:
            out += _enc_str(name) + _enc_value(kind, v)
    return out + _zigzag(0)


def _dec_map(buf: io.BytesIO) -> dict:
    out: dict = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            return out
        if n < 0:  # negative block count: long byte-size follows (spec)
            n = -n
            _read_zigzag(buf)
        for _ in range(n):
            key = _dec_str(buf)  # key BEFORE value: RHS evaluates first
            out[key] = _dec_value(buf)


def encode_dml_bytes(
    op: str,
    database: str,
    table: str,
    commit_ts: int,
    schema_version: int,
    data,  # list[(name, kind, value)] | None
    old,  # list[(name, kind, value)] | None
    checksum: tuple[int, bool, int, int] | None = None,
    claim_check_location: str | None = None,
    handle_key_only: bool | None = None,
) -> bytes:
    """One DML Message in simple-avro wire form (newDMLMessageMap)."""
    dml_type = {"I": 0, "U": 1, "D": 2}[op]
    body = (
        _zigzag(3)  # MessageType enum: DML
        + _zigzag(3)  # payload union branch: DML
        + _zigzag(VERSION)
        + _enc_str(database)
        + _enc_str(table)
        + _zigzag(0)  # tableID
        + _zigzag(dml_type)
        + _zigzag(int(commit_ts))
        + _zigzag(0)  # buildTs pinned
        + _zigzag(int(schema_version))
    )
    if claim_check_location is None:
        body += _zigzag(0)
    else:
        body += _zigzag(1) + _enc_str(claim_check_location)
    if handle_key_only is None:
        body += _zigzag(0)
    else:
        body += _zigzag(1) + (b"\x01" if handle_key_only else b"\x00")
    if checksum is None:
        body += _zigzag(0)
    else:
        ver, corrupted, cur, prev = checksum
        body += (
            _zigzag(1)
            + _zigzag(int(ver))
            + (b"\x01" if corrupted else b"\x00")
            + _zigzag(int(cur))
            + _zigzag(int(prev))
        )
    body += _zigzag(0) if data is None else _zigzag(1) + _enc_map(data)
    body += _zigzag(0) if old is None else _zigzag(1) + _enc_map(old)
    return body


def encode_watermark_bytes(ts: int) -> bytes:
    """Watermark Message (newResolvedMessageMap, avro.go:135-154)."""
    return (
        _zigzag(0)  # MessageType WATERMARK
        + _zigzag(0)  # union branch Watermark
        + _zigzag(VERSION)
        + _zigzag(int(ts))
        + _zigzag(0)  # buildTs pinned
    )


def _enc_table_schema_native(ts: dict) -> bytes:
    """TableSchema record from its native-map form: {database, table,
    tableID, version, columns: [{name, mysqlType, charset, collate?,
    length?, nullable, default?}], indexes: [{name, unique, primary,
    nullable, columns}]} — the shape newTableSchemaMap builds and
    newTableSchemaFromAvroNative reads back. Empty arrays are the bare
    zero terminator (no 0-count block)."""
    out = (
        _enc_str(ts["database"])
        + _enc_str(ts["table"])
        + _zigzag(int(ts.get("tableID", 0)))
        + _zigzag(int(ts["version"]))
    )
    cols = ts.get("columns") or []
    if cols:
        out += _zigzag(len(cols))
        for c in cols:
            out += _enc_str(c["name"])
            # DataType record (message.json:2-60)
            out += _enc_str(c["mysqlType"])
            out += _enc_str(c.get("charset", "utf8mb4"))
            out += _enc_str(c.get("collate", "utf8mb4_bin"))
            out += _zigzag(int(c.get("length", 0)))
            out += _zigzag(0)  # decimal: null
            out += _zigzag(0)  # elements: null
            out += _zigzag(0)  # unsigned: null
            out += _zigzag(0)  # zerofill: null
            out += b"\x01" if c["nullable"] else b"\x00"
            if c.get("default") is None:
                out += _zigzag(0)
            else:
                out += _zigzag(1) + _enc_str(c["default"])
    out += _zigzag(0)  # columns array end
    idxs = ts.get("indexes") or []
    if idxs:
        out += _zigzag(len(idxs))
        for i in idxs:
            out += _enc_str(i["name"])
            out += b"\x01" if i["unique"] else b"\x00"
            out += b"\x01" if i["primary"] else b"\x00"
            out += b"\x01" if i["nullable"] else b"\x00"
            icols = i.get("columns") or []
            if icols:
                out += _zigzag(len(icols))
                for c in icols:
                    out += _enc_str(c)
            out += _zigzag(0)  # index-columns array end
    out += _zigzag(0)  # indexes array end
    return out


def _enc_table_schema(
    database: str,
    table: str,
    schema_version: int,
    columns,  # list[(name, mysql_type, nullable)]
    pk_cols: tuple[str, ...],
) -> bytes:
    return _enc_table_schema_native(
        {
            "database": database,
            "table": table,
            "version": schema_version,
            "columns": [
                {"name": n, "mysqlType": t, "nullable": nl}
                for n, t, nl in columns
            ],
            "indexes": (
                [
                    {
                        "name": "primary",
                        "unique": True,
                        "primary": True,
                        "nullable": False,
                        "columns": list(pk_cols),
                    }
                ]
                if pk_cols
                else []
            ),
        }
    )


DDL_TYPE_SYMBOLS = (
    "CREATE", "ALTER", "ERASE", "RENAME",
    "TRUNCATE", "CINDEX", "DINDEX", "QUERY",
)


def encode_ddl_bytes(
    ddl_type: str,
    sql: str,
    commit_ts: int,
    table_schema: dict | None,
    pre_table_schema: dict | None,
) -> bytes:
    """DDL Message (newDDLMessageMap, avro.go:178-210): DDLType enum per
    getDDLType, post/pre TableSchema as null-unions."""
    out = (
        _zigzag(2)  # MessageType DDL
        + _zigzag(2)  # union branch DDL
        + _zigzag(VERSION)
        + _zigzag(DDL_TYPE_SYMBOLS.index(ddl_type))
        + _enc_str(sql)
        + _zigzag(int(commit_ts))
        + _zigzag(0)  # buildTs pinned
    )
    if table_schema is None:
        out += _zigzag(0)
    else:
        out += _zigzag(1) + _enc_table_schema_native(table_schema)
    if pre_table_schema is None:
        out += _zigzag(0)
    else:
        out += _zigzag(1) + _enc_table_schema_native(pre_table_schema)
    return out


def encode_bootstrap_bytes(
    database: str,
    table: str,
    schema_version: int,
    columns,
    pk_cols: tuple[str, ...],
) -> bytes:
    """Bootstrap Message (newBootstrapMessageMap, avro.go:156-176)."""
    return (
        _zigzag(1)  # MessageType BOOTSTRAP
        + _zigzag(1)  # union branch Bootstrap
        + _zigzag(VERSION)
        + _zigzag(0)  # buildTs pinned
        + _enc_table_schema(database, table, schema_version, columns, pk_cols)
    )


def _dec_table_schema(buf: io.BytesIO) -> dict:
    out = {
        "database": _dec_str(buf),
        "table": _dec_str(buf),
        "tableID": _read_zigzag(buf),
        "version": _read_zigzag(buf),
    }
    cols = []
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_zigzag(buf)
        for _ in range(n):
            col = {"name": _dec_str(buf)}
            col["mysqlType"] = _dec_str(buf)
            col["charset"] = _dec_str(buf)
            col["collate"] = _dec_str(buf)
            col["length"] = _read_zigzag(buf)
            for opt in ("decimal", "elements", "unsigned", "zerofill"):
                if _read_zigzag(buf) == 1:
                    if opt == "decimal":
                        col[opt] = _read_zigzag(buf)
                    elif opt == "elements":
                        elems = []
                        while True:
                            k = _read_zigzag(buf)
                            if k == 0:
                                break
                            if k < 0:
                                k = -k
                                _read_zigzag(buf)
                            elems.extend(_dec_str(buf) for _ in range(k))
                        col[opt] = elems
                    else:
                        col[opt] = buf.read(1) == b"\x01"
            col["nullable"] = buf.read(1) == b"\x01"
            if _read_zigzag(buf) == 1:
                col["default"] = _dec_str(buf)
            cols.append(col)
    out["columns"] = cols
    indexes = []
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_zigzag(buf)
        for _ in range(n):
            idx = {
                "name": _dec_str(buf),
                "unique": buf.read(1) == b"\x01",
                "primary": buf.read(1) == b"\x01",
                "nullable": buf.read(1) == b"\x01",
            }
            icols = []
            while True:
                k = _read_zigzag(buf)
                if k == 0:
                    break
                if k < 0:
                    k = -k
                    _read_zigzag(buf)
                icols.extend(_dec_str(buf) for _ in range(k))
            idx["columns"] = icols
            indexes.append(idx)
    out["indexes"] = indexes
    return out


def decode_message_bytes(raw: bytes) -> dict:
    """One simple-avro Message → native dict (newMessageFromAvroNative)."""
    buf = io.BytesIO(raw)
    mtype = MESSAGE_TYPES[_read_zigzag(buf)]
    branch = _read_zigzag(buf)
    if MESSAGE_TYPES[branch] != mtype:
        raise ValueError(
            f"simple-avro: payload branch {branch} disagrees with type {mtype}"
        )
    if mtype == "WATERMARK":
        return {
            "type": mtype,
            "version": _read_zigzag(buf),
            "commitTs": _read_zigzag(buf),
            "buildTs": _read_zigzag(buf),
        }
    if mtype == "BOOTSTRAP":
        return {
            "type": mtype,
            "version": _read_zigzag(buf),
            "buildTs": _read_zigzag(buf),
            "tableSchema": _dec_table_schema(buf),
        }
    if mtype == "DDL":
        out = {
            "type": mtype,
            "version": _read_zigzag(buf),
            "ddlType": DDL_TYPE_SYMBOLS[_read_zigzag(buf)],
            "sql": _dec_str(buf),
            "commitTs": _read_zigzag(buf),
            "buildTs": _read_zigzag(buf),
        }
        if _read_zigzag(buf) == 1:
            out["tableSchema"] = _dec_table_schema(buf)
        if _read_zigzag(buf) == 1:
            out["preTableSchema"] = _dec_table_schema(buf)
        return out
    out = {
        "type": mtype,
        "version": _read_zigzag(buf),
        "database": _dec_str(buf),
        "table": _dec_str(buf),
        "tableID": _read_zigzag(buf),
        "dmlType": DML_TYPES[_read_zigzag(buf)],
        "commitTs": _read_zigzag(buf),
        "buildTs": _read_zigzag(buf),
        "schemaVersion": _read_zigzag(buf),
    }
    if _read_zigzag(buf) == 1:
        out["claimCheckLocation"] = _dec_str(buf)
    if _read_zigzag(buf) == 1:
        out["handleKeyOnly"] = buf.read(1) == b"\x01"
    if _read_zigzag(buf) == 1:
        out["checksum"] = {
            "version": _read_zigzag(buf),
            "corrupted": buf.read(1) == b"\x01",
            "current": _read_zigzag(buf),
            "previous": _read_zigzag(buf),
        }
    out["data"] = _dec_map(buf) if _read_zigzag(buf) == 1 else None
    out["old"] = _dec_map(buf) if _read_zigzag(buf) == 1 else None
    return out


# ------------------------------------------------------------- spark level

# envelope image → (name, kind) per encodeValue4Avro on the demo table
_IMAGE_KINDS = (("id", "long"), ("balance", "double"), ("note", "string"))


def _image_entries(i, b, n):
    return [
        ("id", "long", None if pd.isna(i) else int(i)),
        ("balance", "double", None if pd.isna(b) else float(b)),
        ("note", "string", n if n is not None else None),
    ]


def encode_simple_avro(
    env: DataFrame,
    schema_version: int = 1,
    with_checksum: bool = False,
    checksum_version: int = 1,
) -> DataFrame:
    """Envelope → simple-avro DML messages (schema, table, commit_ts,
    seq, value BINARY). ``with_checksum`` adds the Checksum record union
    (newDMLMessageMap's EnableRowChecksum block, avro.go:275-288):
    ``current`` over the new image (I/U), ``previous`` over the old
    (U/D), absent sides 0 — same carried-value convention as the JSON
    variant in simple.encode_simple_checksum."""
    from tiflow_spark.functions.hashing import row_checksum

    names = [n for n, _ in _IMAGE_KINDS]
    flat = env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        "op",
        *[F.col(f"after.{n}").alias(f"_a_{n}") for n in names],
        *[F.col(f"before.{n}").alias(f"_b_{n}") for n in names],
    )
    if with_checksum:
        cur = F.when(
            F.col("op") != "D", row_checksum([f"_a_{n}" for n in names])
        ).otherwise(F.lit(0))
        prev = F.when(
            F.col("op") != "I", row_checksum([f"_b_{n}" for n in names])
        ).otherwise(F.lit(0))
    else:
        cur = prev = F.lit(None).cast("long")
    flat = flat.withColumn("_cur", cur.cast("long")).withColumn(
        "_prev", prev.cast("long")
    )

    @pandas_udf(T.BinaryType())
    def enc(
        op: pd.Series, db: pd.Series, tbl: pd.Series, cts: pd.Series,
        ai: pd.Series, ab: pd.Series, an: pd.Series,
        bi: pd.Series, bb: pd.Series, bn: pd.Series,
        cur: pd.Series, prev: pd.Series,
    ) -> pd.Series:
        out = []
        for k in range(len(op)):
            o = op.iloc[k]
            data = (
                _image_entries(ai.iloc[k], ab.iloc[k], an.iloc[k])
                if o != "D"
                else None
            )
            old = (
                _image_entries(bi.iloc[k], bb.iloc[k], bn.iloc[k])
                if o != "I"
                else None
            )
            ck = (
                None
                if pd.isna(cur.iloc[k])
                else (
                    checksum_version,
                    False,
                    int(cur.iloc[k]),
                    int(prev.iloc[k]),
                )
            )
            out.append(
                encode_dml_bytes(
                    o, db.iloc[k], tbl.iloc[k], cts.iloc[k],
                    schema_version, data, old, checksum=ck,
                )
            )
        return pd.Series(out, dtype=object)

    return flat.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        enc(
            F.col("op"), F.col("schema"), F.col("table"), F.col("commit_ts"),
            F.col("_a_id"), F.col("_a_balance"), F.col("_a_note"),
            F.col("_b_id"), F.col("_b_balance"), F.col("_b_note"),
            F.col("_cur"), F.col("_prev"),
        ).alias("value"),
    )


_DML_OUT = T.StructType(
    [
        T.StructField("msg_type", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("schema_version", T.LongType()),
        T.StructField("data_id", T.LongType()),
        T.StructField("data_balance", T.DoubleType()),
        T.StructField("data_note", T.StringType()),
        T.StructField("old_id", T.LongType()),
        T.StructField("old_balance", T.DoubleType()),
        T.StructField("old_note", T.StringType()),
        T.StructField("carried_current", T.LongType()),
        T.StructField("carried_previous", T.LongType()),
    ]
)


def decode_simple_avro(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
    verify_checksum: bool = False,
) -> DataFrame:
    """Simple-avro DML messages → typed change rows (decoder.go avro
    path → newMessageFromAvroNative). ``verify_checksum`` recomputes the
    row checksum over the decoded images JVM-side and rides
    ``checksum_ok`` (common/verify_checksum.go semantics: a 0/absent
    carried side verifies trivially)."""
    from tiflow_spark.functions.hashing import row_checksum

    @pandas_udf(_DML_OUT)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for v in value:
            m = decode_message_bytes(bytes(v))
            data = m.get("data") or {}
            old = m.get("old") or {}
            ck = m.get("checksum") or {}
            rows.append(
                {
                    "msg_type": m["type"],
                    "op": {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}[
                        m["dmlType"]
                    ],
                    "database": m["database"],
                    "table": m["table"],
                    "commit_ts": m["commitTs"],
                    "schema_version": m["schemaVersion"],
                    "data_id": data.get("id"),
                    "data_balance": data.get("balance"),
                    "data_note": data.get("note"),
                    "old_id": old.get("id"),
                    "old_balance": old.get("balance"),
                    "old_note": old.get("note"),
                    "carried_current": ck.get("current"),
                    "carried_previous": ck.get("previous"),
                }
            )
        return pd.DataFrame(rows)

    out = messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols, "_d.*"
    )
    if not verify_checksum:
        return out.drop("carried_current", "carried_previous")
    cur_ok = F.when(
        F.col("carried_current").isNull() | (F.col("carried_current") == 0),
        F.lit(True),
    ).otherwise(
        F.col("carried_current")
        == row_checksum(["data_id", "data_balance", "data_note"])
    )
    prev_ok = F.when(
        F.col("carried_previous").isNull() | (F.col("carried_previous") == 0),
        F.lit(True),
    ).otherwise(
        F.col("carried_previous")
        == row_checksum(["old_id", "old_balance", "old_note"])
    )
    return out.withColumn("checksum_ok", cur_ok & prev_ok).drop(
        "carried_current", "carried_previous"
    )


def encode_simple_avro_watermark(
    resolved: DataFrame,
    ts_col: str = "resolved_ts",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Resolved-ts → simple-avro WATERMARK messages."""

    @pandas_udf(T.BinaryType())
    def enc(ts: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_watermark_bytes(int(v)) for v in ts], dtype=object
        )

    return resolved.select(
        *extra_cols,
        F.col(ts_col).alias("resolved_ts"),
        enc(F.col(ts_col)).alias("value"),
    )


def bootstrap_avro_messages(
    env: DataFrame,
    schema_version: int = 1,
    pk_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One BOOTSTRAP message per (schema, table), avro wire — the
    simple-avro counterpart of simple.bootstrap_messages (same demo
    column model: id bigint, balance double, note varchar)."""
    cols = [
        ("id", "bigint", "id" not in pk_cols),
        ("balance", "double", "balance" not in pk_cols),
        ("note", "varchar", "note" not in pk_cols),
    ]

    @pandas_udf(T.BinaryType())
    def enc(db: pd.Series, tbl: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_bootstrap_bytes(
                    db.iloc[k], tbl.iloc[k], schema_version, cols, pk_cols
                )
                for k in range(len(db))
            ],
            dtype=object,
        )

    return (
        env.select("schema", "table")
        .distinct()
        .select(
            "schema",
            "table",
            enc(F.col("schema"), F.col("table")).alias("value"),
        )
    )


_EVENT_OUT = T.StructType(
    [
        T.StructField("msg_type", T.StringType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("column_names", T.StringType()),
        T.StructField("pk_names", T.StringType()),
    ]
)


def decode_simple_avro_events(
    frames: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Mixed watermark/bootstrap frames → per-type summary rows (the
    consumer's peel loop over newMessageFromAvroNative)."""

    @pandas_udf(_EVENT_OUT)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for v in value:
            m = decode_message_bytes(bytes(v))
            if m["type"] == "WATERMARK":
                rows.append(
                    {
                        "msg_type": "WATERMARK",
                        "database": None,
                        "table": None,
                        "commit_ts": m["commitTs"],
                        "column_names": None,
                        "pk_names": None,
                    }
                )
            else:
                ts = m["tableSchema"]
                pk = [
                    c
                    for i in ts["indexes"]
                    if i["primary"]
                    for c in i["columns"]
                ]
                rows.append(
                    {
                        "msg_type": m["type"],
                        "database": ts["database"],
                        "table": ts["table"],
                        "commit_ts": None,
                        "column_names": ",".join(
                            c["name"] for c in ts["columns"]
                        ),
                        "pk_names": ",".join(pk) if pk else None,
                    }
                )
        return pd.DataFrame(rows)

    return frames.withColumn("_d", dec(F.col(value_col))).select("_d.*")


def _ts_from_json(ts: dict | None) -> dict | None:
    """encode_simple_ddl's JSON tableSchema struct → the native map
    _enc_table_schema_native takes (the JSON form keys the database as
    ``schema``; column DataType carries mysqlType+charset)."""
    if ts is None:
        return None
    return {
        "database": ts["schema"],
        "table": ts["table"],
        "tableID": ts.get("tableID", 0),
        "version": ts["version"],
        "columns": [
            {
                "name": c["name"],
                "mysqlType": c["dataType"]["mysqlType"],
                "charset": c["dataType"].get("charset", "utf8mb4"),
                "nullable": c["nullable"],
            }
            for c in (ts.get("columns") or [])
        ],
        "indexes": [
            {
                "name": i["name"],
                "unique": i["unique"],
                "primary": i["primary"],
                "nullable": i["nullable"],
                "columns": i.get("columns") or [],
            }
            for i in (ts.get("indexes") or [])
        ],
    }


def transcode_simple_ddl_to_avro(
    json_msgs: DataFrame, value_col: str = "value"
) -> DataFrame:
    """simple-protocol DDL JSON messages → the avro wire of the SAME
    native message — the reference's marshaller split (marshaller.go:
    44-55): one native DDL map, marshalled by the JSON marshaller or the
    goavro one per encoding-format. Keeps the registry as-of resolution
    single-sourced in simple.encode_simple_ddl."""
    import json as _json

    @pandas_udf(T.BinaryType())
    def enc(value: pd.Series) -> pd.Series:
        out = []
        for v in value:
            m = _json.loads(v)
            out.append(
                encode_ddl_bytes(
                    m["type"],
                    m["sql"],
                    m["commitTs"],
                    _ts_from_json(m.get("tableSchema")),
                    _ts_from_json(m.get("preTableSchema")),
                )
            )
        return pd.Series(out, dtype=object)

    return json_msgs.withColumn(value_col, enc(F.col(value_col)))


_DDL_OUT = T.StructType(
    [
        T.StructField("ddl_kind", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("post_version", T.LongType()),
        T.StructField("post_columns", T.StringType()),
        T.StructField("post_pk", T.StringType()),
        T.StructField("pre_version", T.LongType()),
        T.StructField("pre_columns", T.StringType()),
        T.StructField("pre_pk", T.StringType()),
    ]
)


def _ts_summary(ts: dict | None):
    if ts is None:
        return None, None, None
    cols = ",".join(f"{c['name']}:{c['mysqlType']}" for c in ts["columns"])
    pk = [
        c
        for i in ts["indexes"]
        if i["primary"]
        for c in i["columns"]
    ]
    return ts["version"], cols, (",".join(pk) if pk else None)


def decode_simple_avro_ddl(
    frames: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Simple-avro DDL frames → structured DDL rows: kind, sql, and the
    post/pre TableSchema summarized as version + name:type column csv +
    primary-key csv (what a consumer's schema registry folds on)."""

    @pandas_udf(_DDL_OUT)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for v in value:
            m = decode_message_bytes(bytes(v))
            post_v, post_c, post_pk = _ts_summary(m.get("tableSchema"))
            pre_v, pre_c, pre_pk = _ts_summary(m.get("preTableSchema"))
            rows.append(
                {
                    "ddl_kind": m["ddlType"],
                    "query": m["sql"],
                    "commit_ts": m["commitTs"],
                    "post_version": post_v,
                    "post_columns": post_c,
                    "post_pk": post_pk,
                    "pre_version": pre_v,
                    "pre_columns": pre_c,
                    "pre_pk": pre_pk,
                }
            )
        return pd.DataFrame(rows)

    return frames.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols, "_d.*"
    )
