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
