"""Round 11: compression hardening + the production JVM engine switch.

Covers the r10 ADVICE items (snappy >64 KiB literal forms, truncated-input
guards) and VERDICT r10 task #3 (route encode-side compression to a JVM
codec when available, prove wire-compatibility between the pure-Python
block codec and the JVM codec on the snappy block format).
"""

from __future__ import annotations

import random

import pytest

from tiflow_spark.codecs.compress import (
    _emit_literal,
    compress_bytes,
    compress_messages,
    decompress_messages,
    jvm_lz4_frame_compress,
    jvm_lz4_frame_decompress,
    jvm_snappy_compress,
    jvm_snappy_decompress,
    snappy_compress,
    snappy_decompress,
)


def _match_free(n: int) -> bytes:
    """n bytes with no repeated 4-byte substring (ascending counters), so
    the greedy matcher finds zero copies and must emit one n-byte literal."""
    return b"".join(i.to_bytes(4, "big") for i in range(n // 4 + 1))[:n]


def test_snappy_literal_over_64k():
    """ADVICE r10 (medium): a match-free input >64 KiB used to crash
    _emit_literal with OverflowError (only 1/2-byte length forms emitted).
    The 3-byte form (tag 62) must round-trip."""
    data = _match_free(70_000)
    assert snappy_decompress(snappy_compress(data)) == data


def test_snappy_literal_tag_forms_62_63():
    """Emit-side tag 62 (3 length bytes) and tag 63 (4 length bytes)
    round-trip through the decoder without running the O(n) matcher on
    16 MiB (literal emission exercised directly)."""
    for n in (0x10001, 0x1000000, 0x1000001):
        data = b"x" * n
        from tiflow_spark.codecs.compress import _uvarint

        out = bytearray(_uvarint(n))
        _emit_literal(out, data, 0, n)
        assert snappy_decompress(bytes(out)) == data


def test_snappy_truncated_input_guards():
    """ADVICE r10 (low): corrupt/truncated streams raise a clean
    ValueError everywhere (uvarint, tag byte, length bytes, copy
    offsets) — never IndexError."""
    good = snappy_compress(b"abcdabcdabcdabcd" * 10)
    cases = [
        b"",  # empty: uvarint truncated
        b"\x80",  # uvarint continuation with no next byte
        b"\xff" * 12,  # uvarint never terminates (overflow guard)
        good[:-1],  # truncated final element
        good[:1],  # tag byte missing after length
        bytes([8, (60 << 2)]),  # literal tag 60, length byte missing
        bytes([8, (61 << 2), 0x01]),  # tag 61, only 1 of 2 length bytes
        bytes([8, 1]),  # kind-1 copy, offset byte missing
        bytes([8, 2, 0x01]),  # kind-2 copy, 1 of 2 offset bytes
        bytes([8, 3, 0x01, 0x02]),  # kind-3 copy, 2 of 4 offset bytes
    ]
    for broken in cases:
        with pytest.raises(ValueError):
            snappy_decompress(broken)


def test_snappy_jvm_wire_compat(spark):
    """VERDICT r10 #3: the pure-Python block codec and the JVM codec
    Spark ships (org.xerial.snappy — what the Kafka producer / parquet
    writer use) speak the same wire format, proven in BOTH directions
    over mixed-entropy fuzz inputs including the >64 KiB literal path."""
    import os as _os

    random.seed(1101)
    cases = [b"", b"x", b"ab" * 4000, _os.urandom(5000), b"a" * 1000,
             bytes(range(256)) * 8, _match_free(70_000)]
    for _ in range(50):
        n = random.randrange(0, 3000)
        alpha = random.choice([2, 4, 256])
        cases.append(bytes(random.randrange(alpha) for _ in range(n)))
    for c in cases:
        # python-encoded → JVM decodes
        assert jvm_snappy_decompress(snappy_compress(c), spark) == c
        # JVM-encoded → python decodes
        assert snappy_decompress(jvm_snappy_compress(c, spark)) == c


def test_lz4_jvm_frame_roundtrip(spark):
    """LZ4 frame format through lz4-java (net.jpountz, ships with Spark):
    driver-side encode/decode round-trips; the magic number matches the
    public LZ4 frame spec (0x184D2204 LE) the reference emits via
    pierrec/lz4."""
    random.seed(1102)
    for c in [b"", b"hello world " * 100, bytes(random.randrange(4) for _ in range(5000))]:
        wire = jvm_lz4_frame_compress(c, spark)
        assert wire[:4] == bytes.fromhex("04224d18")  # LZ4 frame magic, LE
        assert jvm_lz4_frame_decompress(wire, spark) == c
    # python lz4 stays an import-try gate (no lz4 module here)
    with pytest.raises(ModuleNotFoundError):
        compress_bytes("lz4", b"zz")


def test_compress_engine_transport(spark, tmp_path):
    """The production engine switch: engine="transport" leaves values
    byte-identical (binary cast only — zero Python in the plan) and the
    file-broker writer compresses JVM-side via transport_compression;
    the consumer replays the same bytes."""
    from tiflow_spark.sinks.mq import (
        consume_file_broker,
        produce_file_broker,
    )

    rows = [
        ("t1", 0, f"k{i}", f"v{i}" * 50, 100 + i, i) for i in range(200)
    ]
    msgs = spark.createDataFrame(
        rows, "topic string, partition int, key string, value string, "
        "commit_ts long, seq long"
    )
    out = compress_messages(msgs, "snappy", engine="transport")
    got = {r["key"]: bytes(r["value"]) for r in out.collect()}
    assert got == {f"k{i}": (f"v{i}" * 50).encode() for i in range(200)}

    broker = str(tmp_path / "broker")
    produce_file_broker(out, broker, transport_compression="snappy")
    back = consume_file_broker(spark, broker, "t1")
    replayed = {r["key"]: bytes(r["value"]) for r in back.collect()}
    assert replayed == got

    with pytest.raises(ValueError, match="unknown compression engine"):
        compress_messages(msgs, "snappy", engine="gpu")
    with pytest.raises(ValueError, match="Unsupported compression"):
        compress_messages(msgs, "zstd", engine="transport")
    # decompress of a transport stream is cc="none": byte passthrough
    rt = decompress_messages(out, "none", as_string=True)
    vals = {r["key"]: r["value"] for r in rt.collect()}
    assert vals["k0"] == "v0" * 50


def test_claim_check_payload_formats_and_reassembly(spark):
    """pkg/sink/kafka/claimcheck WriteMessage parity: default mode
    externalizes the ClaimCheckMessage JSON (base64 std encoding, null
    key like Go's nil []byte), claim-check-raw-value externalizes the
    raw value; the consumer restores originals in BOTH modes."""
    import json

    from tiflow_spark.codecs.claim_check import (
        apply_claim_check,
        assemble_claim_check,
    )

    big = "B" * 500
    msgs = spark.createDataFrame(
        [(1, "small-one"), (2, big)], "seq long, value string"
    )
    for raw in (False, True):
        env = apply_claim_check(msgs, 100, "s3://claims", raw_value=raw)
        claimed = {r["seq"]: r for r in env.collect()}
        assert not claimed[1]["is_claim"] and claimed[2]["is_claim"]
        payload = claimed[2]["claim_payload"]
        if raw:
            assert payload == big
        else:
            m = json.loads(payload)
            assert m["key"] is None
            import base64 as b64mod

            assert b64mod.b64decode(m["value"]).decode() == big
            assert "\r\n" not in m["value"]  # std encoding, not MIME
        store = env.filter("is_claim").select(
            "claim_location", "claim_payload"
        )
        back = assemble_claim_check(
            env.select("seq", "value"), store, raw_value=raw
        )
        restored = {r["seq"]: r["value"] for r in back.collect()}
        assert restored == {1: "small-one", 2: big}


def test_open_claim_check_frame_guard_raises(spark):
    """The open-protocol claim reassembly must RAISE on a corrupt value
    frame (length header not covering the payload, decoder.go:337-338),
    not silently drop the row — negative test pinning the
    assert-in-consumed-predicate pattern (Catalyst prunes dropped
    asserts)."""
    import base64
    import json

    from pyspark.sql import functions as F  # noqa: F401
    from tiflow_spark.codecs.open_protocol import (
        assemble_open_claim_check,
        encode_open_claim_check,
    )
    from tiflow_spark.plans.parity import _env

    env = _env(spark, "/root/testdata/sf0.001").limit(50)
    enveloped = encode_open_claim_check(env, 121, "claim")
    store = (
        enveloped.filter("is_claim")
        .select("claim_location", "claim_payload")
        .distinct()
    )
    # healthy path restores
    good = assemble_open_claim_check(
        enveloped.select("seq", "key", "value"), store
    )
    assert good.filter("claim_version = 1").count() > 0

    # corrupt ONE payload's value-length header (+1) and expect the raise
    rows = store.collect()
    assert rows, "fixture produced no claimed rows"
    broken_rows = []
    for i, r in enumerate(rows):
        payload = json.loads(r["claim_payload"])
        if i == 0:
            fv = bytearray(base64.b64decode(payload["value"]))
            fv[7] = (fv[7] + 1) % 256
            payload["value"] = base64.b64encode(bytes(fv)).decode()
        broken_rows.append((r["claim_location"], json.dumps(payload)))
    broken = spark.createDataFrame(
        broken_rows, "claim_location string, claim_payload string"
    )
    bad = assemble_open_claim_check(
        enveloped.select("seq", "key", "value"), broken
    )
    with pytest.raises(Exception, match="frame length mismatch"):
        bad.collect()


# ------------------------------------------------ simple protocol avro wire


def test_simple_avro_fuzz_roundtrip():
    """Every value-union branch of message.json's image map (null, long,
    float, double, string, bytes, Timestamp, UnsignedBigint) round-trips
    through the binary wire under randomized values — negative varints,
    astral-plane unicode, empty bytes."""
    import struct as _struct

    from tiflow_spark.codecs.simple_avro import (
        decode_message_bytes,
        encode_dml_bytes,
    )

    random.seed(1103)
    for _ in range(200):
        entries = []
        expect = {}
        for i in range(random.randrange(0, 6)):
            name = f"c{i}"
            kind = random.choice(
                ["long", "float", "double", "string", "bytes",
                 "timestamp", "unsigned"]
            )
            if random.random() < 0.2:
                entries.append((name, kind, None))
                expect[name] = None
                continue
            if kind == "long":
                v = random.randrange(-(2**62), 2**62)
                entries.append((name, kind, v))
                expect[name] = v
            elif kind == "float":
                v = random.uniform(-1e30, 1e30)
                entries.append((name, kind, v))
                expect[name] = _struct.unpack("<f", _struct.pack("<f", v))[0]
            elif kind == "double":
                v = random.uniform(-1e300, 1e300)
                entries.append((name, kind, v))
                expect[name] = v
            elif kind == "string":
                v = "".join(
                    random.choice("aé中𐍈 \n\"\\") for _ in range(
                        random.randrange(0, 20))
                )
                entries.append((name, kind, v))
                expect[name] = v
            elif kind == "bytes":
                v = bytes(
                    random.randrange(256) for _ in range(
                        random.randrange(0, 30))
                )
                entries.append((name, kind, v))
                expect[name] = v
            elif kind == "timestamp":
                entries.append((name, kind, ("UTC", "2020-01-01 00:00:00")))
                expect[name] = {
                    "location": "UTC", "value": "2020-01-01 00:00:00"
                }
            else:  # unsigned — int64-reinterpreted uint64
                v = random.randrange(-(2**63), 2**63)
                entries.append((name, kind, v))
                expect[name] = v
        cts = random.randrange(0, 2**62)
        wire = encode_dml_bytes(
            "U", "db", "tbl", cts, 7, entries, entries,
            checksum=(1, False, random.randrange(2**32), 0),
        )
        m = decode_message_bytes(wire)
        assert m["commitTs"] == cts and m["schemaVersion"] == 7
        assert m["data"] == expect and m["old"] == expect


def test_simple_avro_wire_guards():
    """Truncated strings raise ValueError; a Message whose payload-union
    branch disagrees with its MessageType enum raises (the decoder's
    type/payload cross-check)."""
    from tiflow_spark.codecs.avro import _zigzag
    from tiflow_spark.codecs.simple_avro import (
        decode_message_bytes,
        encode_dml_bytes,
        encode_watermark_bytes,
    )

    good = encode_dml_bytes("I", "d", "t", 5, 1,
                            [("id", "long", 1)], None)
    with pytest.raises((ValueError, IndexError)):
        decode_message_bytes(good[: len(good) // 2])
    # type says WATERMARK(0) but payload branch says DML(3)
    mismatched = _zigzag(0) + _zigzag(3) + encode_watermark_bytes(9)[2:]
    with pytest.raises(ValueError, match="disagrees"):
        decode_message_bytes(mismatched)


def test_simple_avro_checksum_verify_catches_corruption(spark):
    """decode_simple_avro(verify_checksum=True) recomputes over the
    decoded images: a message carrying a +1-flipped current checksum
    comes back checksum_ok=False while intact rows verify; a 0 carried
    side verifies trivially (verify_checksum.go:37)."""
    from tiflow_spark.codecs.simple_avro import (
        decode_simple_avro,
        encode_dml_bytes,
        encode_simple_avro,
    )
    from tiflow_spark.plans.parity import _env

    env = _env(spark, "/root/testdata/sf0.001").limit(64)
    dec = decode_simple_avro(
        encode_simple_avro(env, with_checksum=True), verify_checksum=True
    )
    assert dec.count() == 64
    assert dec.filter("NOT checksum_ok").count() == 0

    # hand-craft one corrupted frame: carried current off by one
    from tiflow_spark.functions.hashing import row_checksum
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(11, 2.5, "zz")], "id long, balance double, note string"
    ).select(row_checksum(["id", "balance", "note"]).alias("ck"))
    real = probe.collect()[0]["ck"]
    frame = encode_dml_bytes(
        "I", "d", "t", 5, 1,
        [("id", "long", 11), ("balance", "double", 2.5),
         ("note", "string", "zz")],
        None, checksum=(1, False, int(real) + 1, 0),
    )
    bad = spark.createDataFrame([(bytearray(frame),)], "value binary")
    got = decode_simple_avro(bad, verify_checksum=True).collect()[0]
    assert not got["checksum_ok"]
    # and the intact twin verifies
    okf = encode_dml_bytes(
        "I", "d", "t", 5, 1,
        [("id", "long", 11), ("balance", "double", 2.5),
         ("note", "string", "zz")],
        None, checksum=(1, False, int(real), 0),
    )
    okdf = spark.createDataFrame([(bytearray(okf),)], "value binary")
    assert decode_simple_avro(okdf, verify_checksum=True).collect()[0][
        "checksum_ok"
    ]


def test_simple_avro_bootstrap_schema_nesting():
    """The Bootstrap TableSchema wire nests ColumnSchema/DataType/
    IndexSchema exactly (newTableSchemaMap): optional DataType unions
    (decimal/elements/unsigned/zerofill) absent → null branch, primary
    index carries the pk columns, column nullability follows the pk."""
    from tiflow_spark.codecs.simple_avro import (
        decode_message_bytes,
        encode_bootstrap_bytes,
    )

    wire = encode_bootstrap_bytes(
        "s1", "t1", 3,
        [("id", "bigint", False), ("balance", "double", True),
         ("note", "varchar", True)],
        ("id",),
    )
    m = decode_message_bytes(wire)
    ts = m["tableSchema"]
    assert ts["database"] == "s1" and ts["version"] == 3
    assert [c["name"] for c in ts["columns"]] == ["id", "balance", "note"]
    assert ts["columns"][0]["nullable"] is False
    assert ts["columns"][0]["mysqlType"] == "bigint"
    assert "decimal" not in ts["columns"][0]  # null union branch
    idx = ts["indexes"]
    assert len(idx) == 1 and idx[0]["primary"] and idx[0]["columns"] == ["id"]


def test_simple_avro_ddl_wire_nesting():
    """DDL frames: DDLType enum symbols, post/pre TableSchema null
    unions, column default union present/absent, empty indexes as the
    bare zero terminator."""
    from tiflow_spark.codecs.simple_avro import (
        decode_message_bytes,
        encode_ddl_bytes,
    )

    ts = {
        "database": "d", "table": "t", "version": 2,
        "columns": [
            {"name": "id", "mysqlType": "bigint", "nullable": False},
            {"name": "note", "mysqlType": "varchar", "nullable": True,
             "default": "x"},
        ],
        "indexes": [
            {"name": "primary", "unique": True, "primary": True,
             "nullable": False, "columns": ["id"]},
        ],
    }
    m = decode_message_bytes(
        encode_ddl_bytes("ALTER", "ALTER TABLE t ADD note varchar", 42,
                         ts, None)
    )
    assert m["ddlType"] == "ALTER" and m["commitTs"] == 42
    assert m["tableSchema"]["columns"][1]["default"] == "x"
    assert "default" not in m["tableSchema"]["columns"][0]
    assert "preTableSchema" not in m
    m2 = decode_message_bytes(
        encode_ddl_bytes("QUERY", "CREATE DATABASE x", 7, None, ts)
    )
    assert "tableSchema" not in m2 and m2["preTableSchema"]["version"] == 2
    # empty indexes array: bare zero terminator round-trips
    m3 = decode_message_bytes(
        encode_ddl_bytes("CREATE", "c", 1, dict(ts, indexes=[]), None)
    )
    assert m3["tableSchema"]["indexes"] == []
    # all eight DDLType symbols survive the enum wire
    for k in ("CREATE", "ALTER", "ERASE", "RENAME", "TRUNCATE",
              "CINDEX", "DINDEX", "QUERY"):
        assert decode_message_bytes(
            encode_ddl_bytes(k, "q", 1, None, None)
        )["ddlType"] == k


def test_simple_avro_ddl_transcode_matches_json(spark):
    """The avro DDL wire carries the SAME native message as the JSON
    marshaller (marshaller.go:44-55): every field the JSON form ships is
    recovered identically after JSON→avro transcode→decode."""
    import json

    from tiflow_spark.codecs.simple import encode_simple_ddl
    from tiflow_spark.codecs.simple_avro import (
        decode_message_bytes,
        transcode_simple_ddl_to_avro,
    )
    from tiflow_spark.plans.parity import _allowed_ddl, registry_from_ddl

    ddl = _allowed_ddl(spark, "/root/testdata/sf0.001")
    json_msgs = encode_simple_ddl(ddl, registry_from_ddl(ddl))
    rows = {
        r["seq"]: json.loads(r["value"]) for r in json_msgs.collect()
    }
    avro_rows = {
        r["seq"]: bytes(r["value"])
        for r in transcode_simple_ddl_to_avro(json_msgs).collect()
    }
    assert rows and set(rows) == set(avro_rows)
    for seq, jm in rows.items():
        am = decode_message_bytes(avro_rows[seq])
        assert am["ddlType"] == jm["type"]
        assert am["sql"] == jm["sql"]
        assert am["commitTs"] == jm["commitTs"]
        for side, akey in (("tableSchema", "tableSchema"),
                           ("preTableSchema", "preTableSchema")):
            if jm.get(side) is None:
                assert akey not in am
                continue
            jts, ats = jm[side], am[akey]
            assert ats["database"] == jts["schema"]
            assert ats["version"] == jts["version"]
            assert [c["name"] for c in ats["columns"]] == [
                c["name"] for c in jts["columns"]
            ]
            assert [c["mysqlType"] for c in ats["columns"]] == [
                c["dataType"]["mysqlType"] for c in jts["columns"]
            ]
            assert [i["columns"] for i in ats["indexes"]] == [
                i["columns"] for i in jts["indexes"]
            ]


# --------------------------------------------- canal protobuf (legacy) wire


def test_canal_proto_fuzz_roundtrip():
    """Randomized multi-entry packets (mixed row + DDL entries, unicode
    values, nulls, negative sqlType varints) survive the Packet →
    Messages → Entry → RowChange → Column peel byte-exactly."""
    from tiflow_spark.codecs import canal_proto as cp

    random.seed(1104)
    for _ in range(100):
        entries = []
        expect = []
        for _e in range(random.randrange(1, 5)):
            if random.random() < 0.3:
                kind = random.choice(
                    ["create table", "add column", "drop table",
                     "create schema", "truncate table"]
                )
                sql = "ALTER " + "é中" * random.randrange(0, 9)
                cts = random.randrange(0, 2**50)
                entries.append(
                    cp.encode_entry_ddl_pb(kind, "db", "tbl", cts, sql)
                )
                expect.append(("ddl", kind, sql, cts >> 18))
            else:
                op = random.choice(["I", "U", "D"])
                note = None if random.random() < 0.3 else (
                    "n" + "𐍈" * random.randrange(0, 4)
                )
                after = [] if op == "D" else [
                    ("id", "bigint", str(random.randrange(0, 10**12))),
                    ("balance", "double", "1.5"),
                    ("note", "varchar", note),
                ]
                before = [] if op == "I" else [
                    ("id", "bigint", "3"),
                    ("balance", "double", None),
                    ("note", "varchar", "x"),
                ]
                cts = random.randrange(0, 2**50)
                entries.append(
                    cp.encode_entry_row_pb(op, "db", "tbl", cts,
                                           after, before)
                )
                expect.append(("row", op, note, cts >> 18))
        got = cp.decode_packet(cp.pack_canal_packet(entries))
        assert len(got) == len(expect)
        for e, (k, *rest) in zip(got, expect):
            if k == "ddl":
                kind, sql, et = rest
                assert e["rowChange"]["sql"] == sql
                assert e["header"].get("executeTime", 0) == et
                assert e["rowChange"]["isDdl"] == (
                    cp.DDL_EVENT_TYPES.get(kind, "QUERY") != "QUERY"
                )
            else:
                op, note, et = rest
                assert e["header"].get("executeTime", 0) == et
                ev = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[op]
                assert e["rowChange"]["eventType"] == ev
                if op != "D":
                    cols = {c["name"]: c for c in e["columns"]}
                    assert cols["id"]["sqlType"] == -5  # 10-byte varint
                    if note is None:
                        assert cols["note"]["isNull"]
                    else:
                        assert cols["note"]["value"] == note
                    # updated = !IsDelete on every column
                    assert all(c["updated"] for c in e["columns"])
                else:
                    assert all(not c["updated"] for c in e["pre_columns"])


def test_canal_proto_proto3_presence_rules():
    """proto3 emission invariants the writers must honor: oneof-wrapped
    fields (isNull, isDdl, version, eventType) present even at default;
    plain defaults (isKey=false, value='', logfileName) absent."""
    from tiflow_spark.codecs import canal_proto as cp

    col = cp.encode_column_pb("note", "varchar", "", False, False)
    fields = {f for f, _w, _v in cp._read_fields(col)}
    assert 6 in fields  # isNull oneof: present though false
    assert 4 not in fields and 5 not in fields  # plain false bools absent
    assert 8 not in fields  # empty value string absent
    colnull = cp.encode_column_pb("note", "varchar", None, True, True)
    d = cp._dec_column(colnull)
    assert d["isNull"] and d["isKey"] and d["updated"] and d["value"] == ""

    entry = cp.encode_entry_row_pb("I", "s", "t", 0, [
        ("id", "bigint", "1"), ("balance", "double", "0.5"),
        ("note", "varchar", "x")], [])
    e = cp.decode_packet(cp.pack_canal_packet([entry]))[0]
    # executeTime 0 omitted; version/sourceType oneofs still decode
    assert e["header"].get("executeTime", 0) == 0
    assert e["rowChange"]["isDdl"] is False  # oneof false, on the wire
    raw_rc_fields = set()
    for ef, _w, ev in cp._read_fields(entry):
        if ef == 3:
            raw_rc_fields = {f for f, _x, _y in cp._read_fields(ev)}
    assert 10 in raw_rc_fields  # isDdl oneof serialized though false


def test_canal_proto_truncation_guards():
    """Corrupt packets raise ValueError (truncated varint, truncated
    length-delimited, wrong packet type/version) — never a silent
    short read."""
    import pytest as _pytest

    from tiflow_spark.codecs import canal_proto as cp

    entry = cp.encode_entry_row_pb("I", "s", "t", 1, [
        ("id", "bigint", "1"), ("balance", "double", "1.0"),
        ("note", "varchar", "a")], [])
    good = cp.pack_canal_packet([entry])
    with _pytest.raises(ValueError):
        cp.decode_packet(good[:-3])
    with _pytest.raises(ValueError):
        cp.decode_packet(b"\x80")  # varint never terminates
    with _pytest.raises(ValueError):
        cp.decode_packet(b"\xff" * 12)  # varint overflow
    # packet claiming type ACK (3) instead of MESSAGES
    bad_type = cp._f_varint(2, 1) + cp._f_varint(3, 3) + cp._f_bytes(5, b"")
    with _pytest.raises(ValueError, match="packet type"):
        cp.decode_packet(bad_type)
    bad_ver = cp._f_varint(2, 9) + cp._f_varint(3, 7) + cp._f_bytes(5, b"")
    with _pytest.raises(ValueError, match="packet version"):
        cp.decode_packet(bad_ver)


def test_output_raw_change_event_knob(spark):
    """output-raw-change-event (pkg/config/sink.go:453-463; model/
    sink.go:1187-1196): raw mode ships identity-changing updates as
    single U events with both images; split mode (default) explodes them
    to D+I. Same column layout either way, and the raw stream's events
    are exactly the split stream's with the D+I pairs re-fused."""
    from tiflow_spark.operators.transforms import split_updates
    from tiflow_spark.plans.parity import _env

    env = _env(spark, "/root/testdata/sf0.001")
    split = split_updates(env)
    raw = split_updates(env, output_raw_change_event=True)
    assert split.columns == raw.columns
    n_idchange = env.filter(
        "op = 'U' AND before.id IS NOT NULL AND after.id IS NOT NULL "
        "AND before.id <> after.id"
    ).count()
    assert n_idchange > 0, "fixture has no identity-changing updates"
    assert raw.count() == env.count()
    assert split.count() == env.count() + n_idchange
    # raw mode keeps the original ops untouched
    assert raw.filter("op = 'U'").count() == env.filter("op = 'U'").count()
    # non-identity-changing rows are identical in both modes
    keep_split = {
        r["seq"]: (r["op"], r["key"])
        for r in split.collect()
    }
    for r in raw.collect():
        if r["seq"] in keep_split and r["op"] != "U":
            assert keep_split[r["seq"]] == (r["op"], r["key"])


def test_paragraph_first_wins_semantics(spark):
    """First-occurrence-wins at paragraph granularity: the (doc_id, pos)
    minimum survives, later repeats are cut (including within one doc),
    blank paragraphs always survive, fully-duplicated docs come back
    empty."""
    from tiflow_spark.llm.dedup import dedup_paragraphs_first_wins

    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta\n\nalpha"),      # self-repeat of alpha
            (2, "beta\n\ngamma"),                # beta repeats doc1's
            (3, "alpha\n\nbeta"),                # fully duplicated
            (4, "\n\ndelta"),                    # leading blank survives
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs_first_wins(docs).collect()
    }
    assert out[1]["text"] == "alpha\n\nbeta" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "gamma" and out[2]["n_removed"] == 1
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text"] == "\n\ndelta" and out[4]["n_removed"] == 0
    assert out[4]["n_paragraphs"] == 2


def test_simple_avro_dml_matches_json_marshaller(spark):
    """Cross-marshaller equivalence on DML (marshaller.go:44-55: one
    native message, two wire forms): decoding the avro wire recovers
    exactly the images the JSON form carries for every event in the
    fixture envelope — including the string-vs-typed value mapping."""
    import json

    from tiflow_spark.codecs.simple import encode_simple
    from tiflow_spark.codecs.simple_avro import (
        decode_simple_avro,
        encode_simple_avro,
    )
    from tiflow_spark.plans.parity import _env

    env = _env(spark, "/root/testdata/sf0.001")
    jrows = {
        r["seq"]: json.loads(r["value"])
        for r in encode_simple(env).collect()
    }
    arows = {
        r["seq"]: r
        for r in decode_simple_avro(
            encode_simple_avro(env), extra_cols=("seq",)
        ).collect()
    }
    assert set(jrows) == set(arows) and jrows
    for seq, jm in jrows.items():
        am = arows[seq]
        assert am["op"] == {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}[
            jm["type"]
        ]
        assert am["commit_ts"] == jm["commitTs"]
        assert am["database"] == jm["database"]
        jd, jo = jm.get("data"), jm.get("old")
        # JSON carries string-rendered values; avro carries typed ones
        if jd is None:
            assert am["data_id"] is None
        else:
            assert str(am["data_id"]) == jd["id"]
            assert (jd["note"] is None) == (am["data_note"] is None)
            if jd["note"] is not None:
                assert am["data_note"] == jd["note"]
        if jo is None:
            assert am["old_id"] is None
        else:
            assert str(am["old_id"]) == jo["id"]


def test_avro_decimal_twos_complement_sign_extension():
    """decimal-handling-mode=precise: minimal two's-complement bytes
    round-trip across sign/byte boundaries, and the wire length is
    minimal (no redundant sign bytes)."""
    from tiflow_spark.codecs.avro import (
        _dec_twos_complement,
        _read_twos_complement,
    )

    for n in (0, 1, -1, 127, 128, -128, -129, 255, 256, 2500,
              -1234502500, 2**40, -(2**40), 2**62, -(2**62)):
        raw = _dec_twos_complement(n)
        assert _read_twos_complement(raw) == n
        if n not in (0,):
            # minimality: dropping the leading byte must change the value
            assert len(raw) == 1 or _read_twos_complement(raw[1:]) != n
