"""Avro codec — Confluent-wire-format Avro binary messages.

Reference: pkg/sink/codec/avro/avro.go (~1050 LoC: schema generation from
the table, Confluent/Glue registry clients, key+value messages). Our value
record mirrors the reference's layout for the demo payload, including the
TiDB extension fields (enable-tidb-extension):

    record EnvelopeValue {
        long   id;
        union {null, double} balance;
        union {null, string} note;
        string _tidb_op;          // I/U/D
        long   _tidb_commit_ts;
    }

Wire format: 1 magic byte 0x00 + 4-byte big-endian schema id + Avro binary
body (Confluent framing, avro.go / schema-registry wire format — public
spec). The Avro binary encoding (zigzag varint longs, little-endian
doubles, length-prefixed strings, union branch indexes) is implemented
directly since no Avro library ships in this environment.

Spark shape: encoding runs as an Arrow-batched pandas UDF (the documented
slow path for codecs Spark cannot express with built-ins — SURVEY.md §2.8
flags avro as the one codec needing custom bytes). Decode mirrors it.
Both are map-only stages; everything else in the pipeline stays JVM-side.

Registry decision (final): the schema registry stays LOCAL — an in-process
id↔schema map behind the same lookup interface a Confluent/Glue client
exposes. The wire format is registry-agnostic (the 4-byte schema id is
opaque to consumers), so swapping in a live registry client is a
constructor argument, not a format change; a network client would be
untestable in this sandbox and adds no coverage of the encoding itself,
which is what the reference's avro.go owns.
"""

from __future__ import annotations

import io
import json
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MAGIC = b"\x00"

VALUE_SCHEMA = {
    "type": "record",
    "name": "EnvelopeValue",
    "namespace": "default.envelope",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "balance", "type": ["null", "double"], "default": None},
        {"name": "note", "type": ["null", "string"], "default": None},
        {"name": "_tidb_op", "type": "string"},
        {"name": "_tidb_commit_ts", "type": "long"},
    ],
}

KEY_SCHEMA = {
    "type": "record",
    "name": "EnvelopeKey",
    "namespace": "default.envelope",
    "fields": [{"name": "id", "type": "long"}],
}

# enable-tidb-extension=false (common/config.go:57; avro.go:187-189 only
# calls nativeValueWithExtension when the flag is set): the record is the
# bare row image — no _tidb_op / _tidb_commit_ts fields in schema or body
VALUE_SCHEMA_NO_EXT = {
    **VALUE_SCHEMA,
    "fields": [
        f for f in VALUE_SCHEMA["fields"]
        if not f["name"].startswith("_tidb")
    ],
}


def schema_json(which: str = "value") -> str:
    schemas = {
        "value": VALUE_SCHEMA,
        "value_no_ext": VALUE_SCHEMA_NO_EXT,
        "key": KEY_SCHEMA,
    }
    return json.dumps(schemas.get(which, KEY_SCHEMA))


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _enc_union(val, enc) -> bytes:
    if val is None:
        return _zigzag(0)
    return _zigzag(1) + enc(val)


def encode_value_bytes(
    id_: int, balance, note, op: str, commit_ts: int, schema_id: int,
    enable_tidb_extension: bool = True,
) -> bytes:
    """``enable_tidb_extension=False`` is the off-mode wire
    (common/config.go:57; avro.go:187-189 skips nativeValueWithExtension):
    the Avro body carries ONLY the row image fields — op/commit-ts are
    not recoverable from the message, the documented trade-off of
    running avro without the extension."""
    body = (
        _zigzag(int(id_))
        + _enc_union(balance, lambda v: struct.pack("<d", float(v)))
        + _enc_union(note, _enc_string)
    )
    if enable_tidb_extension:
        body += _enc_string(op) + _zigzag(int(commit_ts))
    return MAGIC + struct.pack(">I", schema_id) + body


def decode_value_bytes(raw: bytes, enable_tidb_extension: bool = True) -> dict:
    assert raw[0:1] == MAGIC, "bad magic byte"
    schema_id = struct.unpack(">I", raw[1:5])[0]
    buf = io.BytesIO(raw[5:])
    rid = _read_zigzag(buf)
    balance = None
    if _read_zigzag(buf) == 1:
        balance = struct.unpack("<d", buf.read(8))[0]
    note = None
    if _read_zigzag(buf) == 1:
        note = buf.read(_read_zigzag(buf)).decode("utf-8")
    out = {
        "schema_id": schema_id,
        "id": rid,
        "balance": balance,
        "note": note,
    }
    if enable_tidb_extension:
        out["op"] = buf.read(_read_zigzag(buf)).decode("utf-8")
        out["commit_ts"] = _read_zigzag(buf)
    else:
        # reader-parity guard: the no-extension record ends here
        assert buf.read(1) == b"", "avro: trailing bytes past record"
    return out


CHECKSUM_VALUE_SCHEMA = {
    **VALUE_SCHEMA,
    "fields": VALUE_SCHEMA["fields"]
    + [
        {"name": "_tidb_row_level_checksum", "type": "string"},
        {"name": "_tidb_corrupted", "type": "boolean"},
        {"name": "_tidb_checksum_version", "type": "int"},
    ],
}


def encode_value_bytes_checksum(
    id_: int, balance, note, op: str, commit_ts: int, schema_id: int,
    checksum: str, corrupted: bool, version: int,
) -> bytes:
    """CHECKSUM_VALUE_SCHEMA body: the enable-row-checksum wire variant
    (avro.go:337-360/503-516 appends _tidb_row_level_checksum as a
    DECIMAL STRING plus the corrupted flag and checksum version)."""
    base = encode_value_bytes(id_, balance, note, op, commit_ts, schema_id)
    return (
        base
        + _enc_string(checksum)
        + (b"\x01" if corrupted else b"\x00")
        + _zigzag(int(version))
    )


def decode_value_bytes_checksum(raw: bytes) -> dict:
    out = decode_value_bytes(raw)
    # re-walk past the base body to the checksum tail
    buf = io.BytesIO(raw[5:])
    _read_zigzag(buf)  # id
    if _read_zigzag(buf) == 1:
        buf.read(8)  # balance
    if _read_zigzag(buf) == 1:
        buf.read(_read_zigzag(buf))  # note
    buf.read(_read_zigzag(buf))  # op
    _read_zigzag(buf)  # commit_ts
    out["carried_checksum"] = buf.read(_read_zigzag(buf)).decode("utf-8")
    out["corrupted"] = buf.read(1) == b"\x01"
    out["checksum_version"] = _read_zigzag(buf)
    return out


def encode_avro_checksum(
    env: DataFrame,
    schema_id: int = 2,
    version: int = 1,
    corrupt_when=None,
) -> DataFrame:
    """encode_avro + the enable-row-checksum fields: the carried checksum
    is computed JVM-side over the event image with the repo's portable
    row checksum (functions/hashing.row_checksum — the role TiDB's
    row-level checksum plays on the reference wire, avro.go:337), then
    stringified into the avro body. ``corrupt_when`` flips the carried
    value (+1) on matching rows — upstream corruption injection for the
    verify path; the _tidb_corrupted flag stays false (upstream believed
    the row was fine; the CONSUMER must catch it)."""
    from tiflow_spark.functions.hashing import row_checksum

    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat = env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        "op",
        img["id"].alias("_id"),
        img["balance"].alias("_balance"),
        img["note"].alias("_note"),
    )
    ck = row_checksum(["_id", "_balance", "_note"])
    if corrupt_when is not None:
        ck = F.when(corrupt_when, ck + 1).otherwise(ck)
    flat = flat.withColumn("_carried", ck.cast("string"))

    @pandas_udf(T.BinaryType())
    def enc_value(
        op: pd.Series, cts: pd.Series, i: pd.Series, b: pd.Series,
        n: pd.Series, carried: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                encode_value_bytes_checksum(
                    i.iloc[k],
                    None if pd.isna(b.iloc[k]) else b.iloc[k],
                    n.iloc[k] if n.iloc[k] is not None else None,
                    op.iloc[k],
                    cts.iloc[k],
                    schema_id,
                    carried.iloc[k],
                    False,
                    version,
                )
                for k in range(len(op))
            ],
            dtype=object,
        )

    @pandas_udf(T.BinaryType())
    def enc_key(i: pd.Series) -> pd.Series:
        return pd.Series(
            [MAGIC + struct.pack(">I", schema_id) + _zigzag(int(v)) for v in i],
            dtype=object,
        )

    return flat.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        enc_key(F.col("_id")).alias("key"),
        enc_value(
            F.col("op"),
            F.col("commit_ts"),
            F.col("_id"),
            F.col("_balance"),
            F.col("_note"),
            F.col("_carried"),
        ).alias("value"),
    )


def decode_avro_checksum(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Decode the enable-row-checksum wire variant, VERIFYING the carried
    checksum the way the consumer does (pkg/sink/codec/common/
    verify_checksum.go VerifyChecksum): recompute over the decoded
    columns, compare with the carried value, and skip verification when
    the carried value is 0/absent (checksum not enabled upstream — BR
    restores). checksum_ok rides the output; callers decide raise vs
    route-to-DLQ (the reference errors the changefeed)."""
    from tiflow_spark.functions.hashing import row_checksum

    out_t = T.StructType(
        [
            T.StructField("schema_id", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("carried_checksum", T.StringType()),
            T.StructField("corrupted", T.BooleanType()),
            T.StructField("checksum_version", T.IntegerType()),
        ]
    )

    @pandas_udf(out_t)
    def dec(value: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([decode_value_bytes_checksum(v) for v in value])

    dec_df = messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols,
        "_d.op",
        "_d.schema_id",
        "_d.id",
        "_d.balance",
        "_d.note",
        "_d.commit_ts",
        "_d.carried_checksum",
        "_d.corrupted",
        "_d.checksum_version",
    )
    recomputed = row_checksum(["id", "balance", "note"])
    return dec_df.withColumn(
        "checksum_ok",
        F.when(
            F.col("carried_checksum").isNull()
            | (F.col("carried_checksum") == "0"),
            F.lit(True),  # verify_checksum.go:37 — zero means not enabled
        ).otherwise(
            F.col("carried_checksum") == recomputed.cast("string")
        ),
    )


def encode_avro(
    env: DataFrame,
    schema_id: int = 1,
    enable_tidb_extension: bool = True,
) -> DataFrame:
    """Envelope → (schema, table, commit_ts, seq, key BINARY, value BINARY).

    D events carry the pre-image (the reference encodes delete as key-only
    on MQ; we keep the full image + _tidb_op, the tidb-extension form).
    ``enable_tidb_extension=False`` emits the bare row-image record
    (no _tidb_op/_tidb_commit_ts — avro.go:187-189 off-mode)."""

    @pandas_udf(T.BinaryType())
    def enc_value(
        op: pd.Series, cts: pd.Series, i: pd.Series, b: pd.Series, n: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                encode_value_bytes(
                    i.iloc[k],
                    None if pd.isna(b.iloc[k]) else b.iloc[k],
                    n.iloc[k] if n.iloc[k] is not None else None,
                    op.iloc[k],
                    cts.iloc[k],
                    schema_id,
                    enable_tidb_extension,
                )
                for k in range(len(op))
            ],
            dtype=object,
        )

    @pandas_udf(T.BinaryType())
    def enc_key(i: pd.Series) -> pd.Series:
        return pd.Series(
            [MAGIC + struct.pack(">I", schema_id) + _zigzag(int(v)) for v in i],
            dtype=object,
        )

    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat = env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        "op",
        img["id"].alias("_id"),
        img["balance"].alias("_balance"),
        img["note"].alias("_note"),
    )
    return flat.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        enc_key(F.col("_id")).alias("key"),
        enc_value(
            F.col("op"),
            F.col("commit_ts"),
            F.col("_id"),
            F.col("_balance"),
            F.col("_note"),
        ).alias("value"),
    )


def decode_avro(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
    enable_tidb_extension: bool = True,
) -> DataFrame:
    """Avro messages → change rows (consumer path, avro decoder parity).

    ``extra_cols`` passes message-frame columns (topic/partition/offset
    broker metadata) through the decode — join-free composition, same
    passthrough as decode_avro_glue. With ``enable_tidb_extension=False``
    the decoded frame has no op/commit_ts columns — they are not on the
    wire (the off-mode's documented information loss)."""
    fields = [
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("id", T.LongType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
    if enable_tidb_extension:
        fields += [
            T.StructField("op", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
        ]
    out_t = T.StructType(fields)

    @pandas_udf(out_t)
    def dec(value: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [decode_value_bytes(v, enable_tidb_extension) for v in value]
        )

    out_cols = (
        ["_d.op"] if enable_tidb_extension else []
    ) + ["_d.schema_id", "_d.id", "_d.balance", "_d.note"] + (
        ["_d.commit_ts"] if enable_tidb_extension else []
    )
    return messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols, *out_cols
    )


class LocalSchemaRegistry:
    """File-backed schema registry (the Confluent subject→id contract;
    avro.go's registry clients + its local test registry
    SetupEncoderAndSchemaRegistry4Testing).

    register() is idempotent per (subject, schema-text) — re-registering
    the same schema returns the same id, a new schema under the subject
    gets the next id (schema evolution). Good enough for single-cluster
    deployments and tests; swap for a real Confluent/Glue client by URL.
    """

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        import json as _json
        import os

        if os.path.exists(self.path):
            with open(self.path) as fh:
                return _json.load(fh)
        return {"next_id": 1, "subjects": {}, "by_id": {}}

    def _save(self, state: dict) -> None:
        import json as _json

        with open(self.path, "w") as fh:
            _json.dump(state, fh, indent=2, sort_keys=True)

    def register(self, subject: str, schema_text: str) -> int:
        state = self._load()
        versions = state["subjects"].setdefault(subject, [])
        for sid in versions:
            if state["by_id"][str(sid)] == schema_text:
                return sid
        sid = state["next_id"]
        state["next_id"] += 1
        versions.append(sid)
        state["by_id"][str(sid)] = schema_text
        self._save(state)
        return sid

    def get_by_id(self, schema_id: int) -> str:
        return self._load()["by_id"][str(schema_id)]

    def latest(self, subject: str) -> tuple[int, str]:
        state = self._load()
        sid = state["subjects"][subject][-1]
        return sid, state["by_id"][str(sid)]


# ------------------------------------------------- AWS Glue wire variant

# Glue message header (glue_schema_registry.go:330-352, mirroring the
# public AWSSchemaRegistryConstants): [version=3][compression=0][16-byte
# schema-version UUID], then the Avro binary body — 18 bytes vs
# Confluent's 5. The consumer resolves the UUID against the registry
# (getGlueSchemaIDFromHeader) instead of a 4-byte numeric id.
GLUE_HEADER_VERSION = 3
GLUE_COMPRESSION_NONE = 0


def glue_schema_version_uuid(subject: str, schema_text: str) -> bytes:
    """Deterministic 16-byte schema-version UUID for the emulated Glue
    registry. Real Glue mints a random UUID server-side at RegisterSchema
    time (glue_client.go CreateSchema/RegisterSchemaVersion); any
    deterministic derivation is equally valid for an emulation and makes
    encode replayable — we use UUIDv5 (sha1) over (subject, schema)."""
    import uuid as _uuid

    return _uuid.uuid5(
        _uuid.NAMESPACE_OID, f"{subject}\x00{schema_text}"
    ).bytes


class GlueSchemaRegistryEmulation:
    """File-backed Glue registry emulation behind the same contract as
    glue_client.go: register(subject, schema) → schema-version UUID (hex);
    get_by_uuid(uuid_hex) → schema text. Idempotent per (subject, schema)
    like the reference's getSchemaVersion-on-AlreadyExists path."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        import json as _json
        import os as _os

        if _os.path.exists(self.path):
            with open(self.path) as fh:
                return _json.load(fh)
        return {"by_uuid": {}, "subjects": {}}

    def register(self, subject: str, schema_text: str) -> str:
        import json as _json

        state = self._load()
        vid = glue_schema_version_uuid(subject, schema_text).hex()
        state["by_uuid"][vid] = schema_text
        state["subjects"].setdefault(subject, [])
        if vid not in state["subjects"][subject]:
            state["subjects"][subject].append(vid)
        with open(self.path, "w") as fh:
            _json.dump(state, fh, indent=2, sort_keys=True)
        return vid

    def get_by_uuid(self, uuid_hex: str) -> str:
        return self._load()["by_uuid"][uuid_hex]


def glue_header(version_uuid: bytes) -> bytes:
    assert len(version_uuid) == 16
    return (
        bytes([GLUE_HEADER_VERSION, GLUE_COMPRESSION_NONE]) + version_uuid
    )


def split_glue_header(raw: bytes) -> tuple[str, bytes]:
    """Parse + validate the 18-byte Glue header, returning (uuid_hex,
    body). Rejects like the reference decoder (decoder.go:405-415): short
    header, wrong header version, non-zero compression byte."""
    if len(raw) < 18:
        raise ValueError("glue header too short")
    if raw[0] != GLUE_HEADER_VERSION:
        raise ValueError(f"glue header version byte {raw[0]} != 3")
    if raw[1] != GLUE_COMPRESSION_NONE:
        raise ValueError(f"glue compression byte {raw[1]} != 0")
    return raw[2:18].hex(), raw[18:]


def encode_avro_glue(env: DataFrame, subject: str = "cdc-value") -> DataFrame:
    """Envelope → Glue-framed Avro messages: same Avro binary body as the
    Confluent path, 18-byte Glue header instead of the 5-byte Confluent
    one. The schema-version UUID is minted per (subject, schema) exactly
    once — a broadcast scalar, not per-row work."""
    vid = glue_schema_version_uuid(subject, schema_json("value"))
    hdr = glue_header(vid)

    @pandas_udf(T.BinaryType())
    def enc_value(
        op: pd.Series, cts: pd.Series, i: pd.Series, b: pd.Series, n: pd.Series
    ) -> pd.Series:
        out = []
        for k in range(len(op)):
            confluent = encode_value_bytes(
                i.iloc[k],
                None if pd.isna(b.iloc[k]) else b.iloc[k],
                n.iloc[k] if n.iloc[k] is not None else None,
                op.iloc[k],
                cts.iloc[k],
                0,
            )
            out.append(hdr + confluent[5:])  # swap framing, keep the body
        return pd.Series(out, dtype=object)

    @pandas_udf(T.BinaryType())
    def enc_key(i: pd.Series) -> pd.Series:
        return pd.Series([hdr + _zigzag(int(v)) for v in i], dtype=object)

    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat = env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        "op",
        img["id"].alias("_id"),
        img["balance"].alias("_balance"),
        img["note"].alias("_note"),
    )
    return flat.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        enc_key(F.col("_id")).alias("key"),
        enc_value(
            F.col("op"),
            F.col("commit_ts"),
            F.col("_id"),
            F.col("_balance"),
            F.col("_note"),
        ).alias("value"),
    )


def decode_avro_glue(
    messages: DataFrame,
    value_col: str = "value",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Glue-framed Avro messages → change rows + the header's
    schema_version_uuid (hex) for registry resolution — the consumer-side
    mirror of getGlueSchemaIDFromHeader + the avro body decode.

    ``extra_cols`` passes message-frame columns (topic/table/seq dispatch
    metadata) through the decode — join-free streaming composition, the
    same passthrough every other codec decoder grew (stream-stream
    self-joins are illegal in Structured Streaming)."""
    out_t = T.StructType(
        [
            T.StructField("schema_version_uuid", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("note", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
        ]
    )

    @pandas_udf(out_t)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for v in value:
            uid, body = split_glue_header(bytes(v))
            d = decode_value_bytes(MAGIC + b"\x00\x00\x00\x00" + body)
            d.pop("schema_id")
            d["schema_version_uuid"] = uid
            rows.append(d)
        return pd.DataFrame(rows)

    return messages.withColumn("_d", dec(F.col(value_col))).select(
        *extra_cols,
        "_d.op",
        "_d.schema_version_uuid",
        "_d.id",
        "_d.balance",
        "_d.note",
        "_d.commit_ts",
    )


def encode_avro_watermark_events(
    ddl: DataFrame | None = None,
    resolved: DataFrame | None = None,
    ts_col: str = "resolved_ts",
) -> DataFrame:
    """Avro-protocol watermark-mode side messages (avro.go:256-303, gated
    by enable-tidb-extension + avro-enable-watermark): DDL events are
    framed as [ddlByte=0x01][json {query, type, schema, table, commitTs}]
    and resolved-ts as [checkpointByte=0x02][8-byte big-endian ts] — the
    non-Avro envelope the consumer peels before the Confluent-wire DML
    frames. Output carries hex(value) so both engines compare the exact
    wire bytes. DDL job-type ids come from the shared DDL_TYPE_IDS table
    (the TiDB ActionType codes, same source as open-protocol)."""
    from pyspark.sql import functions as F

    from tiflow_spark.codecs.open_protocol import DDL_TYPE_IDS

    outs = []
    if ddl is not None:
        arms = F.lit(0)
        for k, i in DDL_TYPE_IDS.items():
            arms = F.when(F.col("ddl_type") == k, i).otherwise(arms)
        body = F.to_json(
            F.struct(
                F.col("query").alias("query"),
                arms.alias("type"),
                F.col("schema").alias("schema"),
                F.col("table").alias("table"),
                F.col("commit_ts").alias("commitTs"),
            )
        )
        outs.append(
            ddl.select(
                F.lit("ddl").alias("kind"),
                F.col("commit_ts").alias("ts"),
                F.col("seq").cast("long").alias("seq"),
                F.concat(
                    F.lit("01"), F.hex(body.cast("binary"))
                ).alias("value_hex"),
            )
        )
    if resolved is not None:
        outs.append(
            resolved.select(
                F.lit("resolved").alias("kind"),
                F.col(ts_col).alias("ts"),
                F.lit(0).cast("long").alias("seq"),
                F.concat(
                    F.lit("02"),
                    F.lpad(F.hex(F.col(ts_col)), 16, "0"),
                ).alias("value_hex"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def decode_avro_watermark_events(
    messages: DataFrame, hex_col: str = "value_hex"
) -> DataFrame:
    """Peel the watermark-mode envelope: 0x01 → DDL json, 0x02 → 8-byte BE
    resolved ts (the consumer-side switch before Avro decode)."""
    from pyspark.sql import functions as F

    tag = F.substring(F.col(hex_col), 1, 2)
    rest = F.expr(f"substring({hex_col}, 3)")
    ddl_schema = (
        "query STRING, type INT, schema STRING, table STRING, "
        "commitTs BIGINT"
    )
    ddl = F.from_json(F.decode(F.unhex(rest), "UTF-8"), ddl_schema)
    return messages.select(
        F.when(tag == "01", "ddl").when(tag == "02", "resolved").alias("kind"),
        F.when(tag == "02", F.conv(rest, 16, 10).cast("long")).alias(
            "resolved_ts"
        ),
        F.when(tag == "01", ddl).alias("ddl"),
    )


# ------------------------------- decimal / unsigned-bigint handling modes


def _dec_twos_complement(unscaled: int) -> bytes:
    """Avro decimal logical type body: minimal two's-complement
    big-endian of the unscaled integer (what goavro/big.Rat ship for
    decimalHandlingMode=precise, avro.go:698-718/865-874)."""
    if unscaled == 0:
        return b"\x00"
    # minimal signed length (java BigInteger.toByteArray): negatives use
    # (n+1).bit_length() so -2^(8k-1) lands in k bytes, not k+1
    if unscaled < 0:
        length = (unscaled + 1).bit_length() // 8 + 1
    else:
        length = unscaled.bit_length() // 8 + 1
    return unscaled.to_bytes(length, "big", signed=True)


def _read_twos_complement(raw: bytes) -> int:
    return int.from_bytes(raw, "big", signed=True)


def encode_avro_handling_modes(
    rows: DataFrame,
    decimal_mode: str = "precise",
    unsigned_mode: str = "long",
    scale: int = 4,
) -> DataFrame:
    """The avro codec's two type-handling knobs (common/config.go:55-56;
    avro.go:698-731 schema gen, :820-876 value encode):

    - ``avro-decimal-handling-mode=precise`` → Avro ``bytes`` with the
      decimal logical type: two's-complement big-endian unscaled int at
      the column scale; ``string`` → the decimal's text form.
    - ``avro-bigint-unsigned-handling-mode=long`` → int64-reinterpreted
      uint64 (values >= 2^63 wrap negative — the documented caveat);
      ``string`` → full-precision decimal text.

    Input rows: (id BIGINT, dec_unscaled BIGINT, dec_str STRING,
    u64_offset BIGINT — the uint64 is 2^63 + u64_offset). Output
    (id, value BINARY): body = id long + mode-dependent dec + mode-
    dependent u64, Confluent-framed like the main codec."""

    @pandas_udf(T.BinaryType())
    def enc(
        i: pd.Series, unsc: pd.Series, dstr: pd.Series, uoff: pd.Series
    ) -> pd.Series:
        out = []
        for k in range(len(i)):
            body = _zigzag(int(i.iloc[k]))
            if decimal_mode == "precise":
                raw = _dec_twos_complement(int(unsc.iloc[k]))
                body += _zigzag(len(raw)) + raw
            else:  # string
                body += _enc_string(dstr.iloc[k])
            u64 = (1 << 63) + int(uoff.iloc[k])
            if unsigned_mode == "long":
                body += _zigzag(u64 - (1 << 64) if u64 >= (1 << 63) else u64)
            else:  # string
                body += _enc_string(str(u64))
            out.append(MAGIC + struct.pack(">I", 7) + body)
        return pd.Series(out, dtype=object)

    return rows.select(
        "id",
        enc(
            F.col("id"), F.col("dec_unscaled"), F.col("dec_str"),
            F.col("u64_offset"),
        ).alias("value"),
    )


def decode_avro_handling_modes(
    messages: DataFrame,
    decimal_mode: str = "precise",
    unsigned_mode: str = "long",
    scale: int = 4,
    value_col: str = "value",
) -> DataFrame:
    """Consumer-side decode of both handling modes; precise decimals come
    back as (unscaled BIGINT, scale) — the lossless pair — plus the
    reconstructed text; long-mode uint64 as the reinterpreted int64."""
    out_t = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("dec_unscaled", T.LongType()),
            T.StructField("dec_scale", T.IntegerType()),
            T.StructField("dec_str", T.StringType()),
            T.StructField("u64_long", T.LongType()),
            T.StructField("u64_str", T.StringType()),
        ]
    )

    @pandas_udf(out_t)
    def dec(value: pd.Series) -> pd.DataFrame:
        rows = []
        for v in value:
            buf = io.BytesIO(bytes(v)[5:])
            rid = _read_zigzag(buf)
            if decimal_mode == "precise":
                unsc = _read_twos_complement(buf.read(_read_zigzag(buf)))
                neg = unsc < 0
                a = abs(unsc)
                txt = f"{a // 10**scale}.{a % 10**scale:0{scale}d}"
                dstr = ("-" if neg else "") + txt
            else:
                dstr = buf.read(_read_zigzag(buf)).decode("utf-8")
                sgn = -1 if dstr.startswith("-") else 1
                ip, fp = dstr.lstrip("-").split(".")
                unsc = sgn * (int(ip) * 10**scale + int(fp.ljust(scale, "0")))
            if unsigned_mode == "long":
                u_long = _read_zigzag(buf)
                u_str = str(u_long + (1 << 64) if u_long < 0 else u_long)
            else:
                u_str = buf.read(_read_zigzag(buf)).decode("utf-8")
                u = int(u_str)
                u_long = u - (1 << 64) if u >= (1 << 63) else u
            rows.append(
                {
                    "id": rid,
                    "dec_unscaled": unsc,
                    "dec_scale": scale,
                    "dec_str": dstr,
                    "u64_long": u_long,
                    "u64_str": u_str,
                }
            )
        return pd.DataFrame(rows)

    return messages.withColumn("_d", dec(F.col(value_col))).select("_d.*")
