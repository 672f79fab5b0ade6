"""Canal protocol — the legacy Alibaba-Canal protobuf wire
(``protocol=canal``, distinct from canal-json).

Reference: pkg/sink/codec/canal/canal_encoder.go (BatchEncoder: entries
proto-marshalled into canal.Messages inside a canal.Packet, Build
:102-134; EncodeDDLEvent :71-100 ships a one-entry packet per DDL;
EncodeCheckpointEvent :41-45 — canal has NO resolved-ts frame, the
event is dropped) and canal_entry.go (buildHeader :59-78, buildColumn
:122-146, buildRowData :148-180, fromRowEvent :183-210, fromDDLEvent
:211-236, convertToCanalTs :238-240 = commitTs >> 18 physical ms,
convertDdlEventType :252-290), over the public schemas
proto/EntryProtocol.proto + proto/CanalProtocol.proto.

Wire stack (proto3 binary, hand-rolled writers — no protobuf runtime in
the container):

    Packet{version=1 (field 2, oneof so ALWAYS serialized),
           type=MESSAGES=7 (field 3), body (field 5)}
      body = Messages{messages: repeated bytes (field 2)}
        each = Entry{header (1), entryType=ROWDATA=2 (2, oneof),
                     storeValue (3)}
          header = Header{version=1 (1, oneof), serverenCode="UTF-8"
                          (5), executeTime=commitTs>>18 (6),
                          sourceType=MYSQL=2 (7, oneof), schemaName (8),
                          tableName (9), eventType (11, oneof),
                          props=[rowsCount] (12) for row events}
          storeValue = RowChange{eventType (2, oneof), isDdl (10, oneof
                       — serialized even when false), sql (11, DDL
                       only), rowDatas (12), ddlSchemaName (14)}
            RowData{beforeColumns (1), afterColumns (2)}
              Column{sqlType (2, java.sql.Types via
                     internal.MySQLType2JavaType: bigint→-5 double→8
                     varchar→12 — negative int32 = 10-byte varint),
                     name (3), isKey (4), updated (5, !IsDelete),
                     isNull (6, oneof), value (8, ALL values strings —
                     formatValue), mysqlType (10)}

proto3 emission rules honored by both writer and reader: plain fields
at default value (empty string, 0, false) are omitted; oneof-wrapped
fields (version, entryType, sourceType, eventType, isDdl, isNull) are
serialized even at their default — that presence split is why e.g.
``isNull=false`` is always on the wire while ``isKey=false`` is not.

Canal event-type enum: INSERT=1 UPDATE=2 DELETE=3 CREATE=4 ALTER=5
ERASE=6 QUERY=7 TRUNCATE=8 RENAME=9 CINDEX=10 DINDEX=11.

Encoding runs in Arrow-batched pandas UDFs (binary wire is opaque to
Spark); everything upstream/downstream of the codec stays JVM-side.
"""

from __future__ import annotations

import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

CANAL_PACKET_VERSION = 1
CANAL_PROTOCOL_VERSION = 1
CANAL_SERVER_ENCODE = "UTF-8"
PACKETTYPE_MESSAGES = 7
ENTRYTYPE_ROWDATA = 2
SOURCETYPE_MYSQL = 2

EVENT_TYPES = {
    "INSERT": 1, "UPDATE": 2, "DELETE": 3, "CREATE": 4, "ALTER": 5,
    "ERASE": 6, "QUERY": 7, "TRUNCATE": 8, "RENAME": 9, "CINDEX": 10,
    "DINDEX": 11,
}
EVENT_NAMES = {v: k for k, v in EVENT_TYPES.items()}

# internal/java.go MySQLType2JavaType for the demo column model
JAVA_SQL_TYPES = {"bigint": -5, "double": 8, "varchar": 12}

# canal_entry.go convertDdlEventType — the reference's ddl_type strings
# (sources/ddl_stream.py taxonomy) → canal EventType
DDL_EVENT_TYPES = {
    "create table": "CREATE",
    "rename table": "RENAME",
    "create index": "CINDEX", "add primary key": "CINDEX",
    "add foreign key": "CINDEX",
    "drop index": "DINDEX", "drop primary key": "DINDEX",
    "drop foreign key": "DINDEX",
    "drop table": "ERASE",
    "truncate table": "TRUNCATE",
}
_DDL_ALTER_KINDS = (
    "add column", "drop column", "modify column", "rebase auto id",
    "set default value", "modify table comment", "rename index",
    "add table partition", "drop table partition",
    "truncate table partition", "exchange table partition",
    "reorganize table partition", "alter table partitioning",
    "remove table partitioning", "modify table charset and collate",
    "alter index visibility", "multi schema change",
)
for _k in _DDL_ALTER_KINDS:
    DDL_EVENT_TYPES[_k] = "ALTER"


# ------------------------------------------------------- proto3 primitives


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_i64(n: int) -> bytes:
    """Signed int32/int64 on the proto wire: two's-complement 64-bit
    (negative values take 10 bytes — how protobuf ships sqlType=-5)."""
    return _uvarint(n & 0xFFFFFFFFFFFFFFFF)


def _read_uvarint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("canal-proto: truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7
        if shift > 63:
            raise ValueError("canal-proto: varint overflow")


def _read_i64(buf: io.BytesIO) -> int:
    v = _read_uvarint(buf)
    return v - (1 << 64) if v >= (1 << 63) else v


def _tag(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _f_varint(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint_i64(n)


def _f_bytes(field: int, b: bytes) -> bytes:
    return _tag(field, 2) + _uvarint(len(b)) + b


def _f_str(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8"))


def _read_fields(raw: bytes):
    """Generic proto3 walk → list[(field, wire, value)]; value is int for
    varint, bytes for length-delimited."""
    buf = io.BytesIO(raw)
    out = []
    while True:
        head = buf.read(1)
        if not head:
            return out
        buf.seek(-1, 1)
        key = _read_uvarint(buf)
        field, wire = key >> 3, key & 7
        if wire == 0:
            out.append((field, wire, _read_i64(buf)))
        elif wire == 2:
            n = _read_uvarint(buf)
            body = buf.read(n)
            if len(body) != n:
                raise ValueError("canal-proto: truncated length-delimited")
            out.append((field, wire, body))
        else:
            raise ValueError(f"canal-proto: unsupported wire type {wire}")


# ------------------------------------------------------------ entry writers


def encode_column_pb(
    name: str, mysql_type: str, value, is_key: bool, updated: bool
) -> bytes:
    """One canal.Column (buildColumn): all values string-formatted
    (formatValue — canal ships binlog text), isNull oneof always on the
    wire, plain bools omitted when false."""
    sql_type = JAVA_SQL_TYPES[mysql_type]
    out = _f_varint(2, sql_type) + _f_str(3, name)
    if is_key:
        out += _f_varint(4, 1)
    if updated:
        out += _f_varint(5, 1)
    out += _f_varint(6, 1 if value is None else 0)  # isNull oneof
    if value is not None and value != "":
        out += _f_str(8, str(value))
    out += _f_str(10, mysql_type)
    return out


def _header_pb(
    commit_ts: int, schema: str, table: str, event_type: int, row_count: int
) -> bytes:
    out = _f_varint(1, CANAL_PROTOCOL_VERSION)  # oneof: always present
    out += _f_str(5, CANAL_SERVER_ENCODE)
    execute_time = commit_ts >> 18  # convertToCanalTs
    if execute_time:
        out += _f_varint(6, execute_time)
    out += _f_varint(7, SOURCETYPE_MYSQL)  # oneof
    if schema:
        out += _f_str(8, schema)
    if table:
        out += _f_str(9, table)
    out += _f_varint(11, event_type)  # oneof
    if row_count > 0:  # buildHeader's rowsCount Pair
        pair = _f_str(1, "rowsCount") + _f_str(2, str(row_count))
        out += _f_bytes(12, pair)
    return out


def encode_entry_row_pb(
    op: str,
    schema: str,
    table: str,
    commit_ts: int,
    columns,  # list[(name, mysql_type, value)] after image (I/U)
    pre_columns,  # list[(name, mysql_type, value)] before image (U/D)
    pk_names: tuple[str, ...] = ("id",),
) -> bytes:
    """One canal.Entry for a row event (fromRowEvent): header + RowChange
    storeValue with a single RowData; updated=!IsDelete on every column."""
    event_type = EVENT_TYPES[
        {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[op]
    ]
    updated = op != "D"
    row_data = b""
    for name, mt, v in pre_columns or []:
        row_data += _f_bytes(
            1, encode_column_pb(name, mt, v, name in pk_names, updated)
        )
    for name, mt, v in columns or []:
        row_data += _f_bytes(
            2, encode_column_pb(name, mt, v, name in pk_names, updated)
        )
    row_change = (
        _f_varint(2, event_type)  # oneof
        + _f_varint(10, 0)  # isDdl oneof: false but present
        + _f_bytes(12, row_data)
    )
    header = _header_pb(commit_ts, schema, table, event_type, 1)
    return (
        _f_bytes(1, header)
        + _f_varint(2, ENTRYTYPE_ROWDATA)  # oneof
        + _f_bytes(3, row_change)
    )


def encode_entry_ddl_pb(
    ddl_type: str, schema: str, table: str, commit_ts: int, sql: str
) -> bytes:
    """One canal.Entry for a DDL (fromDDLEvent): RowChange carries
    isDdl(per isCanalDDL), sql and ddlSchemaName, no rowDatas; header
    rowCount=-1 so no rowsCount prop."""
    name = DDL_EVENT_TYPES.get(ddl_type, "QUERY")
    event_type = EVENT_TYPES[name]
    # isCanalDDL (canal_entry.go:292-302): QUERY is NOT a canal DDL
    is_ddl = name != "QUERY"
    row_change = (
        _f_varint(2, event_type)
        + _f_varint(10, 1 if is_ddl else 0)
    )
    if sql:
        row_change += _f_str(11, sql)
    if schema:
        row_change += _f_str(14, schema)
    header = _header_pb(commit_ts, schema, table, event_type, -1)
    return (
        _f_bytes(1, header)
        + _f_varint(2, ENTRYTYPE_ROWDATA)
        + _f_bytes(3, row_change)
    )


def pack_canal_packet(entries: list[bytes]) -> bytes:
    """entries → Messages{messages} → Packet{version, MESSAGES, body}
    (canal_encoder.go refreshPacketBody + Build)."""
    messages = b"".join(_f_bytes(2, e) for e in entries)
    return (
        _f_varint(2, CANAL_PACKET_VERSION)  # oneof: always present
        + _f_varint(3, PACKETTYPE_MESSAGES)
        + _f_bytes(5, messages)
    )


# ------------------------------------------------------------ wire readers


def _dec_column(raw: bytes) -> dict:
    col = {"isKey": False, "updated": False, "isNull": False, "value": ""}
    for field, _w, v in _read_fields(raw):
        if field == 2:
            col["sqlType"] = v
        elif field == 3:
            col["name"] = v.decode("utf-8")
        elif field == 4:
            col["isKey"] = bool(v)
        elif field == 5:
            col["updated"] = bool(v)
        elif field == 6:
            col["isNull"] = bool(v)
        elif field == 8:
            col["value"] = v.decode("utf-8")
        elif field == 10:
            col["mysqlType"] = v.decode("utf-8")
    return col


def decode_packet(raw: bytes) -> list[dict]:
    """Packet bytes → list of decoded entries (the consumer peel the
    reference leaves to Alibaba's client; here the verification path)."""
    version = None
    ptype = None
    body = b""
    for field, _w, v in _read_fields(raw):
        if field == 2:
            version = v
        elif field == 3:
            ptype = v
        elif field == 5:
            body = v
    if ptype != PACKETTYPE_MESSAGES:
        raise ValueError(f"canal-proto: unexpected packet type {ptype}")
    if version != CANAL_PACKET_VERSION:
        raise ValueError(f"canal-proto: unexpected packet version {version}")
    entries = []
    for field, _w, v in _read_fields(body):
        if field != 2:
            continue
        entry = {"header": {}, "columns": [], "pre_columns": []}
        store_value = b""
        for ef, _ew, ev in _read_fields(v):
            if ef == 1:
                for hf, _hw, hv in _read_fields(ev):
                    if hf == 6:
                        entry["header"]["executeTime"] = hv
                    elif hf == 8:
                        entry["header"]["schemaName"] = hv.decode("utf-8")
                    elif hf == 9:
                        entry["header"]["tableName"] = hv.decode("utf-8")
                    elif hf == 11:
                        entry["header"]["eventType"] = EVENT_NAMES[hv]
                    elif hf == 12:
                        for pf, _pw, pv in _read_fields(hv):
                            if pf == 1:
                                _pk = pv.decode("utf-8")
                            elif pf == 2:
                                entry["header"][_pk] = pv.decode("utf-8")
            elif ef == 2:
                entry["entryType"] = ev
            elif ef == 3:
                store_value = ev
        rc: dict = {"isDdl": False, "sql": "", "ddlSchemaName": ""}
        for rf, _rw, rv in _read_fields(store_value):
            if rf == 2:
                rc["eventType"] = EVENT_NAMES[rv]
            elif rf == 10:
                rc["isDdl"] = bool(rv)
            elif rf == 11:
                rc["sql"] = rv.decode("utf-8")
            elif rf == 14:
                rc["ddlSchemaName"] = rv.decode("utf-8")
            elif rf == 12:
                for df, _dw, dv in _read_fields(rv):
                    side = "pre_columns" if df == 1 else "columns"
                    entry[side].append(_dec_column(dv))
        entry["rowChange"] = rc
        entries.append(entry)
    return entries


# ------------------------------------------------------------- spark level

_IMAGE_COLS = (("id", "bigint"), ("balance", "double"), ("note", "varchar"))


def _fmt(v, mysql_type: str):
    """formatValue's string rendering for the demo model: integers
    without exponent, floats via repr-min (Go FormatFloat 'f' -1)."""
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if mysql_type == "bigint":
        return str(int(v))
    if mysql_type == "double":
        s = f"{float(v):.17g}"
        return s if "." in s or "e" in s or "inf" in s else s
    return str(v)


def encode_canal_protobuf(env: DataFrame) -> DataFrame:
    """Envelope → one canal Packet per event (schema, table, commit_ts,
    seq, value BINARY). The reference batches N events per packet at
    flush time; per-event packets are the batch-size-1 degenerate the
    tests of canal_encoder_test.go pin first, and pack_canal_packet
    regroups for larger frames."""

    names = [n for n, _ in _IMAGE_COLS]
    flat = env.select(
        "schema", "table", "commit_ts", "seq", "op",
        *[F.col(f"after.{n}").alias(f"_a_{n}") for n in names],
        *[F.col(f"before.{n}").alias(f"_b_{n}") for n in names],
    )

    @pandas_udf(T.BinaryType())
    def enc(
        op: pd.Series, db: pd.Series, tbl: pd.Series, cts: pd.Series,
        ai: pd.Series, ab: pd.Series, an: pd.Series,
        bi: pd.Series, bb: pd.Series, bn: pd.Series,
    ) -> pd.Series:
        out = []
        for k in range(len(op)):
            o = op.iloc[k]
            after = [
                ("id", "bigint", _fmt(ai.iloc[k], "bigint")),
                ("balance", "double", _fmt(ab.iloc[k], "double")),
                ("note", "varchar", _fmt(an.iloc[k], "varchar")),
            ] if o != "D" else []
            before = [
                ("id", "bigint", _fmt(bi.iloc[k], "bigint")),
                ("balance", "double", _fmt(bb.iloc[k], "double")),
                ("note", "varchar", _fmt(bn.iloc[k], "varchar")),
            ] if o != "I" else []
            entry = encode_entry_row_pb(
                o, db.iloc[k], tbl.iloc[k], int(cts.iloc[k]), after, before
            )
            out.append(pack_canal_packet([entry]))
        return pd.Series(out, dtype=object)

    return flat.select(
        "schema", "table", "commit_ts", "seq",
        enc(
            F.col("op"), F.col("schema"), F.col("table"), F.col("commit_ts"),
            F.col("_a_id"), F.col("_a_balance"), F.col("_a_note"),
            F.col("_b_id"), F.col("_b_balance"), F.col("_b_note"),
        ).alias("value"),
    )


_ROW_OUT = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("execute_time", T.LongType()),
        T.StructField("rows_count", T.IntegerType()),
        T.StructField("data_id", T.LongType()),
        T.StructField("data_balance", T.DoubleType()),
        T.StructField("data_note", T.StringType()),
        T.StructField("old_id", T.LongType()),
        T.StructField("old_balance", T.DoubleType()),
        T.StructField("old_note", T.StringType()),
        T.StructField("pk_is_key", T.BooleanType()),
        T.StructField("java_types_ok", T.BooleanType()),
    ]
)


def decode_canal_protobuf(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Canal packets → typed change rows. ``pk_is_key`` asserts the
    handle column carried isKey on the wire; ``java_types_ok`` that
    every column's sqlType matched MySQLType2JavaType."""

    @pandas_udf(_ROW_OUT)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in value:
            for e in decode_packet(bytes(raw)):
                rc = e["rowChange"]
                h = e["header"]

                def img(cols):
                    m = {
                        c["name"]: (None if c["isNull"] else c["value"])
                        for c in cols
                    }
                    return (
                        None if m.get("id") is None else int(m["id"]),
                        None if m.get("balance") is None
                        else float(m["balance"]),
                        m.get("note"),
                    )

                di, db_, dn = img(e["columns"]) if e["columns"] else (
                    None, None, None)
                oi, ob, on = img(e["pre_columns"]) if e["pre_columns"] else (
                    None, None, None)
                all_cols = e["columns"] + e["pre_columns"]
                rows.append(
                    {
                        "op": {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}[
                            rc["eventType"]
                        ],
                        "database": h.get("schemaName"),
                        "table": h.get("tableName"),
                        "execute_time": h.get("executeTime", 0),
                        "rows_count": int(h.get("rowsCount", "0")),
                        "data_id": di,
                        "data_balance": db_,
                        "data_note": dn,
                        "old_id": oi,
                        "old_balance": ob,
                        "old_note": on,
                        "pk_is_key": all(
                            c["isKey"] == (c["name"] == "id")
                            for c in all_cols
                        ),
                        "java_types_ok": all(
                            c["sqlType"] == JAVA_SQL_TYPES[c["mysqlType"]]
                            for c in all_cols
                        ),
                    }
                )
        return pd.DataFrame(rows)

    return messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols, "_d.*"
    )


def encode_canal_protobuf_ddl(ddl: DataFrame) -> DataFrame:
    """DDL events → canal DDL packets (EncodeDDLEvent: one packet per
    DDL). Input: the ddl_stream frame (schema, table, commit_ts, seq,
    ddl_type, query)."""

    @pandas_udf(T.BinaryType())
    def enc(
        kind: pd.Series, db: pd.Series, tbl: pd.Series,
        cts: pd.Series, sql: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                pack_canal_packet(
                    [
                        encode_entry_ddl_pb(
                            kind.iloc[k], db.iloc[k], tbl.iloc[k],
                            int(cts.iloc[k]), sql.iloc[k],
                        )
                    ]
                )
                for k in range(len(kind))
            ],
            dtype=object,
        )

    return ddl.select(
        "schema", "table", "commit_ts", "seq",
        enc(
            F.col("ddl_type"), F.col("schema"), F.col("table"),
            F.col("commit_ts"), F.col("query"),
        ).alias("value"),
    )


_DDL_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("is_ddl", T.BooleanType()),
        T.StructField("sql", T.StringType()),
        T.StructField("ddl_schema", T.StringType()),
        T.StructField("execute_time", T.LongType()),
    ]
)


def decode_canal_protobuf_ddl(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Canal DDL packets → structured DDL rows (event-type taxonomy per
    convertDdlEventType; isDdl per isCanalDDL — false for QUERY)."""

    @pandas_udf(_DDL_OUT)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in value:
            for e in decode_packet(bytes(raw)):
                rc = e["rowChange"]
                rows.append(
                    {
                        "event_type": rc["eventType"],
                        "is_ddl": rc["isDdl"],
                        "sql": rc["sql"],
                        "ddl_schema": rc["ddlSchemaName"],
                        "execute_time": e["header"].get("executeTime", 0),
                    }
                )
        return pd.DataFrame(rows)

    return messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols, "_d.*"
    )
