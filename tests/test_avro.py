"""Avro binary encoding unit checks (wire format + zigzag parity)."""

import struct

from tiflow_spark.codecs.avro import (
    MAGIC,
    _zigzag,
    decode_value_bytes,
    encode_value_bytes,
)


def test_zigzag_known_values():
    # Avro spec examples: 0→00, -1→01, 1→02, -2→03, 2→04
    assert _zigzag(0) == b"\x00"
    assert _zigzag(-1) == b"\x01"
    assert _zigzag(1) == b"\x02"
    assert _zigzag(-2) == b"\x03"
    assert _zigzag(64) == b"\x80\x01"  # multi-byte varint


def test_wire_framing():
    raw = encode_value_bytes(5, None, None, "I", 7, schema_id=42)
    assert raw[0:1] == MAGIC
    assert struct.unpack(">I", raw[1:5])[0] == 42
    # body: zigzag(5), union-null, union-null, "I", zigzag(7)
    assert raw[5:] == b"\x0a" + b"\x00" + b"\x00" + b"\x02I" + b"\x0e"


def test_roundtrip_all_branches():
    for rec in [
        (5, 1.5, "héllo", "U", 1_700_000_000_000_000),
        (-3, None, None, "D", 0),
        (2**40, -0.0, "", "I", 1),
    ]:
        raw = encode_value_bytes(*rec, schema_id=1)
        d = decode_value_bytes(raw)
        assert (d["id"], d["balance"], d["note"], d["op"], d["commit_ts"]) == rec
        assert d["schema_id"] == 1


def test_local_schema_registry_roundtrip(tmp_path):
    from tiflow_spark.codecs.avro import LocalSchemaRegistry, schema_json

    reg = LocalSchemaRegistry(str(tmp_path / "registry.json"))
    v1 = reg.register("envelope-value", schema_json("value"))
    assert reg.register("envelope-value", schema_json("value")) == v1  # idempotent
    k1 = reg.register("envelope-key", schema_json("key"))
    assert k1 != v1
    evolved = schema_json("value").replace("EnvelopeValue", "EnvelopeValueV2")
    v2 = reg.register("envelope-value", evolved)
    assert v2 > v1
    assert reg.get_by_id(v1) == schema_json("value")
    assert reg.latest("envelope-value") == (v2, evolved)


def test_glue_header_wire_bytes():
    """Glue framing (glue_schema_registry.go:330-352): byte 0 is the fixed
    header version 3, byte 1 the no-compression marker 0, bytes 2..17 the
    schema-version UUID, body from 18."""
    from tiflow_spark.codecs.avro import (
        glue_header,
        glue_schema_version_uuid,
        split_glue_header,
    )

    vid = glue_schema_version_uuid("cdc-value", "{}")
    hdr = glue_header(vid)
    assert len(hdr) == 18
    assert hdr[0] == 3 and hdr[1] == 0
    assert hdr[2:18] == vid
    uid, body = split_glue_header(hdr + b"\x0a")
    assert uid == vid.hex() and body == b"\x0a"
    # deterministic + distinct per (subject, schema)
    assert glue_schema_version_uuid("cdc-value", "{}") == vid
    assert glue_schema_version_uuid("other", "{}") != vid


def test_glue_header_rejects():
    """Decoder rejects mirror decoder.go:405-415: short header, wrong
    version byte, non-zero compression byte."""
    import pytest

    from tiflow_spark.codecs.avro import split_glue_header

    with pytest.raises(ValueError, match="too short"):
        split_glue_header(b"\x03\x00\x01")
    with pytest.raises(ValueError, match="version"):
        split_glue_header(b"\x04\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="compression"):
        split_glue_header(b"\x03\x01" + b"\x00" * 16)


def test_glue_registry_emulation_roundtrip(tmp_path):
    from tiflow_spark.codecs.avro import (
        GlueSchemaRegistryEmulation,
        schema_json,
    )

    reg = GlueSchemaRegistryEmulation(str(tmp_path / "glue.json"))
    v1 = reg.register("cdc-value", schema_json("value"))
    assert reg.register("cdc-value", schema_json("value")) == v1  # idempotent
    assert reg.get_by_uuid(v1) == schema_json("value")
    evolved = schema_json("value").replace("EnvelopeValue", "V2")
    v2 = reg.register("cdc-value", evolved)
    assert v2 != v1 and reg.get_by_uuid(v2) == evolved


def test_glue_broker_replay_matches_direct_apply(spark, sf_dir, tmp_path):
    """Consumer-side Glue e2e (the kafka-consumer analog for the Glue wire
    variant): envelope → Glue-framed Avro messages → file broker → decode
    via the header UUID + registry emulation → last-image fold must equal
    the fold computed directly on the change stream, and every decoded
    UUID must resolve to the registered schema text."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tiflow_spark.codecs.avro import (
        GlueSchemaRegistryEmulation,
        decode_avro_glue,
        encode_avro_glue,
        glue_schema_version_uuid,
        schema_json,
    )
    from tiflow_spark.envelope import events_to_changes, load_table

    env = events_to_changes(load_table(spark, sf_dir, "events"))
    enc = encode_avro_glue(env)
    broker = str(tmp_path / "glue-broker")
    enc.write.parquet(broker)  # at-least-once file broker, same substitute
    msgs = spark.read.parquet(broker)

    dec = decode_avro_glue(msgs, extra_cols=("table", "seq"))
    w = Window.partitionBy("table", "id").orderBy(
        F.col("commit_ts").desc(), F.col("seq").desc()
    )
    replayed = (
        dec.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select("table", "id", "balance", "note")
    )

    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat = env.select(
        "table", "seq", "op", "commit_ts",
        img["id"].alias("id"),
        img["balance"].alias("balance"),
        img["note"].alias("note"),
    )
    expected = (
        flat.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select("table", "id", "balance", "note")
    )

    assert replayed.exceptAll(expected).count() == 0
    assert expected.exceptAll(replayed).count() == 0
    assert replayed.count() == expected.count() > 0

    # registry resolution: the wire UUID is the registered (subject, schema)
    # version and resolves back to the schema text the encoder used
    reg = GlueSchemaRegistryEmulation(str(tmp_path / "glue-registry"))
    expected_uuid = glue_schema_version_uuid(
        "cdc-value", schema_json("value")
    ).hex()
    uuids = [r["schema_version_uuid"] for r in dec.select(
        "schema_version_uuid").distinct().collect()]
    assert uuids == [expected_uuid]
    assert reg.register("cdc-value", schema_json("value")) == expected_uuid
    assert reg.get_by_uuid(expected_uuid) == schema_json("value")
