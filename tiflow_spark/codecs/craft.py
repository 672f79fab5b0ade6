"""Craft codec — TiCDC's compact binary columnar format.

Reference: pkg/sink/codec/craft/{model.go,craft_encoder.go,craft_decoder.go,
message_encoder.go}. Wire elements mirrored here:

- uvarint / zigzag-varint primitives (craft buffers use binary.PutUvarint)
- version prefix (Version1, model.go:24)
- per-event header (commit-ts, event-type, schema, table)
- column groups typed 0x1 (new image) / 0x2 (old image)
  (columnGroupTypeNew/Old, model.go:30-31)
- NULL int64 sentinel = -1 (nullInt64, model.go:43); NULL strings/floats
  via a -1 varint length

Documented divergences (simplifications, not semantic changes): the size
table leads the frame instead of trailing it (the trailing layout only
optimizes Go buffer reuse), and the string term-dictionary is omitted
(craft treats an empty dictionary as valid — emptyDecodingTermDictionary,
model.go:49).

Binary assembly can't be expressed with Spark SQL functions, so encode and
decode are Arrow-batched pandas UDFs — the same legitimate-UDF boundary as
the Avro codec (avro.py). Everything stays columnar per batch; no shuffle.
"""

from __future__ import annotations

import io
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

VERSION = 1
GROUP_NEW = 0x1  # columnGroupTypeNew
GROUP_OLD = 0x2  # columnGroupTypeOld
_OP_CODE = {"I": 0, "U": 1, "D": 2, "DDL": 3}
_CODE_OP = {v: k for k, v in _OP_CODE.items()}


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_uvarint(buf: io.BytesIO) -> int:
    shift, result = 0, 0
    while True:
        b = buf.read(1)[0]
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result
        shift += 7


def _varint(n: int) -> bytes:  # zigzag
    return _uvarint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def _read_varint(buf: io.BytesIO) -> int:
    u = _read_uvarint(buf)
    return (u >> 1) ^ -(u & 1)


def _enc_string(s: str | None) -> bytes:
    if s is None:
        return _varint(-1)
    raw = s.encode("utf-8")
    return _varint(len(raw)) + raw


def _dec_string(buf: io.BytesIO) -> str | None:
    n = _read_varint(buf)
    if n < 0:
        return None
    return buf.read(n).decode("utf-8")


def _enc_group(gtype: int, image: dict | None) -> bytes:
    """One column group: type byte, then (id int64, balance f64, note str).
    A missing image encodes as an empty group (0 columns)."""
    out = bytearray([gtype])
    if image is None:
        out += _uvarint(0)
        return bytes(out)
    out += _uvarint(3)
    # null-ness is a flag byte (the reference derives it from size-table
    # offsets; a flag is the layout-free equivalent — negative values must
    # survive, so a -1 sentinel would be lossy)
    iv = image.get("id")
    if iv is None:
        out += b"\x00"
    else:
        out += b"\x01" + _varint(int(iv))
    bv = image.get("balance")
    if bv is None:
        out += b"\x00"
    else:
        out += b"\x01" + struct.pack(">d", float(bv))
    out += _enc_string(image.get("note"))
    return bytes(out)


def _dec_group(buf: io.BytesIO) -> tuple[int, dict | None]:
    gtype = buf.read(1)[0]
    ncols = _read_uvarint(buf)
    if ncols == 0:
        return gtype, None
    iv = _read_varint(buf) if buf.read(1)[0] else None
    bv = struct.unpack(">d", buf.read(8))[0] if buf.read(1)[0] else None
    note = _dec_string(buf)
    return gtype, {"id": iv, "balance": bv, "note": note}


def encode_event(
    op: str,
    schema: str,
    table: str,
    commit_ts: int,
    before: dict | None,
    after: dict | None,
) -> bytes:
    header = (
        _uvarint(int(commit_ts))
        + _uvarint(_OP_CODE[op])
        + _enc_string(schema)
        + _enc_string(table)
    )
    groups = b""
    if after is not None:
        groups += _enc_group(GROUP_NEW, after)
    if before is not None:
        groups += _enc_group(GROUP_OLD, before)
    body = header + groups
    # leading size table: version, body length (trailing in the reference)
    return _uvarint(VERSION) + _uvarint(len(body)) + body


def decode_event(raw: bytes) -> dict:
    buf = io.BytesIO(raw)
    version = _read_uvarint(buf)
    assert version == VERSION, f"craft version {version}"
    body_len = _read_uvarint(buf)
    body = io.BytesIO(buf.read(body_len))
    commit_ts = _read_uvarint(body)
    op = _CODE_OP[_read_uvarint(body)]
    schema = _dec_string(body)
    table = _dec_string(body)
    before = after = None
    while body.tell() < body_len:
        gtype, image = _dec_group(body)
        if gtype == GROUP_NEW:
            after = image
        else:
            before = image
    return {
        "op": op,
        "schema": schema,
        "table": table,
        "commit_ts": commit_ts,
        "before": before,
        "after": after,
    }


def encode_craft(env: DataFrame) -> DataFrame:
    """Envelope → (schema, table, commit_ts, seq, value BINARY)."""

    def _images(x) -> list[dict | None]:
        # struct columns arrive as a pandas DataFrame; a null struct is a
        # row of all-NaN (encoded as an all-null group — same decoded image)
        recs = []
        for r in x.to_dict("records"):
            clean = {
                k: (None if v is None or (isinstance(v, float) and pd.isna(v)) else v)
                for k, v in r.items()
            }
            recs.append(None if all(v is None for v in clean.values()) else clean)
        return recs

    @pandas_udf(T.BinaryType())
    def enc(
        op: pd.Series,
        schema: pd.Series,
        table: pd.Series,
        commit_ts: pd.Series,
        before: pd.DataFrame,
        after: pd.DataFrame,
    ) -> pd.Series:
        return pd.Series(
            [
                encode_event(o, s, t, int(c), b, a)
                for o, s, t, c, b, a in zip(
                    op, schema, table, commit_ts, _images(before), _images(after)
                )
            ]
        )

    return env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        enc("op", "schema", "table", "commit_ts", "before", "after").alias(
            "value"
        ),
    )


def decode_craft(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Craft frames → decoded rows (op, schema, table, commit_ts, id,
    balance, note) — D reads the old image, I/U the new one (the consumer
    contract the kafka-consumer applies)."""
    out_t = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )

    @pandas_udf(out_t)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in value:
            e = decode_event(bytes(raw))
            img = e["before"] if e["op"] == "D" else e["after"]
            img = img or {}
            rows.append(
                {
                    "op": e["op"],
                    "schema": e["schema"],
                    "table": e["table"],
                    "commit_ts": e["commit_ts"],
                    "id": img.get("id"),
                    "balance": img.get("balance"),
                    "note": img.get("note"),
                }
            )
        return pd.DataFrame(rows)

    return messages.select(dec(F.col(value_col)).alias("r")).select("r.*")


# --------- DDL + resolved-ts events (message_encoder.go:295-326)

_CODE_RESOLVED = 4  # beside I/U/D 0-2 and DDL 3 in the simplified op table


def encode_craft_ddl(ddl: DataFrame) -> DataFrame:
    """DDL events → craft frames (message_encoder.go:308-326
    NewDDLEventEncoder): row header (commit-ts, DDL type code, schema,
    table) followed by uvarint(job-type id) + string(query). Job-type ids
    from the shared DDL_TYPE_IDS table (TiDB ActionType codes)."""
    from tiflow_spark.codecs.open_protocol import DDL_TYPE_IDS

    @pandas_udf(T.BinaryType())
    def enc(
        schema: pd.Series, table: pd.Series, commit_ts: pd.Series,
        ddl_type: pd.Series, query: pd.Series,
    ) -> pd.Series:
        out = []
        for s, t, ts, dt, q in zip(schema, table, commit_ts, ddl_type, query):
            header = (
                _uvarint(int(ts))
                + _uvarint(_OP_CODE["DDL"])
                + _enc_string(s)
                + _enc_string(t)
            )
            body = header + _uvarint(DDL_TYPE_IDS.get(dt, 0)) + _enc_string(q)
            out.append(_uvarint(VERSION) + _uvarint(len(body)) + body)
        return pd.Series(out)

    return ddl.select(
        "schema", "table", "commit_ts", "seq",
        enc("schema", "table", "commit_ts", "ddl_type", "query").alias(
            "value"
        ),
    )


def encode_craft_resolved(
    resolved: DataFrame, ts_col: str = "resolved_ts"
) -> DataFrame:
    """Resolved-ts → craft frames (message_encoder.go:295-305
    NewResolvedEventEncoder): header only — ts, resolved type code, NULL
    schema/table — and an empty body."""

    @pandas_udf(T.BinaryType())
    def enc(ts: pd.Series) -> pd.Series:
        out = []
        for t in ts:
            body = (
                _uvarint(int(t))
                + _uvarint(_CODE_RESOLVED)
                + _enc_string(None)
                + _enc_string(None)
            )
            out.append(_uvarint(VERSION) + _uvarint(len(body)) + body)
        return pd.Series(out)

    return resolved.select(
        F.col(ts_col).alias("resolved_ts"), enc(ts_col).alias("value")
    )


def decode_craft_events(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode craft DDL/resolved frames back to
    (kind, schema, table, commit_ts, ddl_type_id, query)."""

    @pandas_udf(
        "kind string, schema string, table string, commit_ts long, "
        "ddl_type_id int, query string"
    )
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in value:
            buf = io.BytesIO(bytes(raw))
            version = _read_uvarint(buf)
            assert version == VERSION
            body_len = _read_uvarint(buf)
            body = io.BytesIO(buf.read(body_len))
            ts = _read_uvarint(body)
            code = _read_uvarint(body)
            s = _dec_string(body)
            t = _dec_string(body)
            if code == _CODE_RESOLVED:
                rows.append(("resolved", s, t, ts, None, None))
            else:
                tid = _read_uvarint(body)
                q = _dec_string(body)
                rows.append(("ddl", s, t, ts, tid, q))
        return pd.DataFrame(
            rows,
            columns=[
                "kind", "schema", "table", "commit_ts", "ddl_type_id",
                "query",
            ],
        )

    return messages.select(dec(value_col).alias("m")).select("m.*")
