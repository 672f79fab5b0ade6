"""Codec round-trips: encode → decode equality (the reference's codec test
strategy, e.g. csv_decoder_test.go / canal_json_decoder_test.go)."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from tiflow_spark.codecs.canal_json import decode_canal_json, encode_canal_json
from tiflow_spark.codecs.csv_codec import CsvConfig, decode_csv, encode_csv
from tiflow_spark.envelope import events_to_changes, load_table

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
)


def _env(spark, sf_dir):
    return events_to_changes(load_table(spark, sf_dir, "events"))


def test_csv_roundtrip(spark, sf_dir):
    env = _env(spark, sf_dir)
    cfg = CsvConfig()
    encoded = encode_csv(env, cfg)
    decoded = decode_csv(encoded, PAYLOAD, cfg)
    # compare against the source images
    src = env.select(
        "op",
        "table",
        "schema",
        "commit_ts",
        F.when(F.col("op") == "D", F.col("before.id"))
        .otherwise(F.col("after.id"))
        .alias("id"),
        F.when(F.col("op") == "D", F.col("before.balance"))
        .otherwise(F.col("after.balance"))
        .alias("balance"),
        F.when(F.col("op") == "D", F.col("before.note"))
        .otherwise(F.col("after.note"))
        .alias("note"),
    )
    assert decoded.count() == src.count()
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0


def test_csv_escape_mode_roundtrip(spark):
    rows = [
        ("I", "t1", "s1", 1, 1, "1", (1, 1.5, 'tricky,"quoted"\nline\\end'), None),
        ("D", "t1", "s1", 2, 2, "2", None, (2, 2.5, "comma,end")),
    ]
    env = spark.createDataFrame(
        [
            (op, t, s, cts, seq, key, after, before)
            for (op, t, s, cts, seq, key, after, before) in rows
        ],
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("schema", T.StringType()),
                T.StructField("commit_ts", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("key", T.StringType()),
                T.StructField("after", PAYLOAD),
                T.StructField("before", PAYLOAD),
            ]
        ),
    )
    for cfg in (CsvConfig(), CsvConfig(quote="")):
        encoded = encode_csv(env, cfg).collect()
        assert len(encoded) == 2
        if cfg.quote:
            assert any('"tricky,""quoted""' in r.line for r in encoded)
        else:
            assert any("tricky\\," in r.line for r in encoded)


def test_csv_old_value_update_splits_to_two_lines(spark, sf_dir):
    env = _env(spark, sf_dir)
    cfg = CsvConfig(output_old_value=True)
    n_u = env.filter("op = 'U'").count()
    n = env.count()
    encoded = encode_csv(env, cfg)
    assert encoded.count() == n + n_u  # each U becomes D+I


def test_canal_json_roundtrip(spark, sf_dir):
    env = _env(spark, sf_dir)
    decoded = decode_canal_json(encode_canal_json(env))
    assert decoded.count() == env.count()
    # op distribution preserved
    src_ops = {r["op"]: r["cnt"] for r in env.groupBy("op").agg(F.count("*").alias("cnt")).collect()}
    dec_ops = {
        r["op"]: r["cnt"]
        for r in decoded.groupBy("op").agg(F.count("*").alias("cnt")).collect()
    }
    assert src_ops == dec_ops
    # image values survive the string round-trip
    sample = decoded.filter("op = 'I'").select(
        F.col("image")["id"].cast("long").alias("id"),
        F.col("image")["balance"].cast("double").alias("balance"),
    )
    src = env.filter("op = 'I'").select(
        F.col("after.id").alias("id"), F.col("after.balance").alias("balance")
    )
    assert sample.exceptAll(src).count() == 0


def test_simple_roundtrip(spark, sf_dir):
    from tiflow_spark.codecs.simple import decode_simple, encode_simple

    env = _env(spark, sf_dir)
    decoded = decode_simple(encode_simple(env))
    assert decoded.count() == env.count()
    # commit_ts survives exactly; insert images survive the string round-trip
    pairs = decoded.filter("op = 'I'").select(
        F.col("image")["id"].cast("long").alias("id"),
        "commit_ts",
    )
    src = env.filter("op = 'I'").select(
        F.col("after.id").alias("id"), "commit_ts"
    )
    assert pairs.exceptAll(src).count() == 0


def test_open_protocol_roundtrip(spark, sf_dir):
    from tiflow_spark.codecs.open_protocol import (
        decode_open_protocol,
        encode_open_protocol,
    )

    env = _env(spark, sf_dir)
    decoded = decode_open_protocol(encode_open_protocol(env))
    assert decoded.count() == env.count()
    # delete/upsert classes match; handle flag + values survive
    n_d = env.filter("op = 'D'").count()
    assert decoded.filter("op_class = 'D'").count() == n_d
    one = decoded.filter("op_class = 'U'").select(
        F.col("image")["id"]["h"].alias("h"),
        F.col("image")["id"]["v"].cast("long").alias("id"),
    )
    src = env.filter("op != 'D'").select(F.col("after.id").alias("id"))
    assert one.filter(~F.col("h")).count() == 0
    assert one.select("id").exceptAll(src).count() == 0


def test_maxwell_roundtrip(spark, sf_dir):
    from tiflow_spark.codecs.maxwell import decode_maxwell, encode_maxwell

    env = _env(spark, sf_dir)
    decoded = decode_maxwell(encode_maxwell(env))
    assert decoded.count() == env.count()
    src_ops = {
        r["op"]: r["cnt"]
        for r in env.groupBy("op").agg(F.count("*").alias("cnt")).collect()
    }
    dec_ops = {
        r["op"]: r["cnt"]
        for r in decoded.groupBy("op").agg(F.count("*").alias("cnt")).collect()
    }
    assert src_ops == dec_ops
    # maxwell's old map holds only CHANGED columns for updates
    changed = decoded.filter("op = 'U'").select(F.size("old_changed").alias("n"))
    assert changed.filter("n <= 0").count() == 0


def test_debezium_roundtrip(spark, sf_dir):
    from tiflow_spark.codecs.debezium import decode_debezium, encode_debezium

    env = _env(spark, sf_dir)
    decoded = decode_debezium(encode_debezium(env))
    assert decoded.count() == env.count()
    # full before/after structs survive typed
    u = decoded.filter("op = 'U'").select("before.id", "after.id", "commit_ts")
    src = env.filter("op = 'U'").select("before.id", "after.id", "commit_ts")
    assert u.exceptAll(src).count() == 0


def test_open_protocol_batch_framing_roundtrip(spark, sf_dir):
    from tiflow_spark.codecs.open_protocol import (
        encode_open_protocol,
        frame_batches,
        unframe_batches,
    )

    msgs = encode_open_protocol(_env(spark, sf_dir))
    frames = frame_batches(msgs, 16)
    back = unframe_batches(frames)
    assert back.count() == msgs.count()
    # every (key, value) pair survives the binary pack/unpack exactly
    assert back.select("key", "value").exceptAll(
        msgs.select("key", "value")
    ).count() == 0
    # batches respect the size cap
    assert frames.filter(F.col("n_events") > 16).count() == 0


def test_craft_event_roundtrip_unit():
    """Pure-python craft frame round-trip incl. nulls, unicode, negatives
    (mirrors pkg/sink/codec/craft/craft_encoder_test.go cases)."""
    from tiflow_spark.codecs.craft import decode_event, encode_event

    cases = [
        ("I", "db", "t", 42, None, {"id": 1, "balance": 3.5, "note": "x"}),
        ("U", "db", "tüble", 7,
         {"id": -5, "balance": None, "note": None},
         {"id": None, "balance": -0.25, "note": 'q"uo,te\n'}),
        ("D", "db", "t", 2**50, {"id": 9, "balance": 0.0, "note": ""}, None),
    ]
    for op, sch, tbl, ts, before, after in cases:
        e = decode_event(encode_event(op, sch, tbl, ts, before, after))
        assert e["op"] == op and e["schema"] == sch and e["table"] == tbl
        assert e["commit_ts"] == ts
        assert e["before"] == before and e["after"] == after
