"""Round 14: named-index dispatch config + VerifyTables rejection parity
(VERDICT r13 #2), large-message AdjustAndValidate matrix (#3), DDL topic
schema-scope fallback (#4), binsearch tuple chunk-id (#6), and the r13
ADVICE items (rule-resolution wiring, ts message key, handle-column
plumbing, byte-preserving binary key hash, storage sentinel default).

Reference pins: cdc/sink/dmlsink/mq/dispatcher/event_router.go:96-160,
213-239; partition/index_value.go:45-86; partition/key.go:35-48; ts.go:36;
pkg/config/large_message.go:47-91; cdc/model/sink.go:1056-1057.
"""

from __future__ import annotations

import warnings
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.config import Dispatcher, TableRule, TaskConfig
from tiflow_spark.operators.dispatchers import (
    TableKeyInfo,
    dispatch,
    inertia_message_key,
    inertia_sum32,
    literal_key_columns,
    partition_column,
    resolve_partition_rule,
    table_key_info_from_ddl,
    verify_tables,
)
from tiflow_spark.sources.ddl_parse import parse_ddl

_IMG = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ]
)
_ROW = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("before", _IMG),
        T.StructField("after", _IMG),
    ]
)


def _env_df(spark, rows=None):
    rows = rows or [
        ("I", "db", "t1", 421, None, (22, "x")),
        ("U", "db", "t2", 422, (23, "y"), (23, "z")),
        ("D", "db", "other", 423, (24, "w"), None),
    ]
    return spark.createDataFrame(rows, _ROW)


# ------------------------------------------------- DDL → TableKeyInfo


def test_plain_key_parse_and_table_key_info():
    op = parse_ddl(
        "CREATE TABLE s.t (id BIGINT PRIMARY KEY, balance DOUBLE, "
        "note VARCHAR, UNIQUE KEY uk_note_id (note, id), "
        "KEY idx_balance (balance))"
    )
    assert op.plain_keys == (("balance",),)
    assert op.plain_key_names == ("idx_balance",)
    info = table_key_info_from_ddl(op)
    assert info.columns == ("id", "balance", "note")
    assert info.handle_columns == ("id",)
    # named indexes: primary + unique (in INDEX order) + non-unique
    assert info.indexes["primary"] == (("id",), True)
    assert info.indexes["uk_note_id"] == (("note", "id"), True)
    assert info.indexes["idx_balance"] == (("balance",), False)


def test_table_key_info_handle_falls_back_to_first_uk():
    op = parse_ddl(
        "CREATE TABLE s.t (a BIGINT, b VARCHAR, UNIQUE KEY uk_ab (a, b))"
    )
    info = table_key_info_from_ddl(op)
    assert info.handle_columns == ("a", "b")


# ------------------------------------------------- VerifyTables parity


def _cfg(index_name=None, partition="index-value", columns=()):
    return TaskConfig(
        dispatchers=(
            Dispatcher(
                tables=(TableRule("*", "*"),),
                partition=partition,
                columns=columns,
                index_name=index_name,
            ),
        )
    )


_INFO = TableKeyInfo(
    columns=("id", "note"),
    handle_columns=("id",),
    indexes={"primary": (("id",), True), "idx_note": (("note",), False)},
)


def test_verify_tables_index_not_found():
    # event_router.go:140-143 — reference message text pinned
    with pytest.raises(ValueError, match=r"index not found when verify the table"):
        verify_tables(_cfg(index_name="nope"), {("db", "t"): _INFO})


def test_verify_tables_index_not_unique():
    # event_router.go:144-151 — only unique indexes may be named
    with pytest.raises(
        ValueError, match=r"index is not unique when verify the table"
    ):
        verify_tables(_cfg(index_name="idx_note"), {("db", "t"): _INFO})


def test_verify_tables_columns_not_found():
    # OffsetsByNames, schema_storage.go:495-498 (lowercase match)
    with pytest.raises(ValueError, match=r"columns not found when dispatch"):
        verify_tables(
            _cfg(partition="columns", columns=("id", "ghost")),
            {("db", "t"): _INFO},
        )


def test_verify_tables_accepts_unique_index_and_case_insensitive_columns():
    verify_tables(_cfg(index_name="primary"), {("db", "t"): _INFO})
    verify_tables(
        _cfg(partition="columns", columns=("ID", "Note")),
        {("db", "t"): _INFO},
    )


def test_verify_tables_only_checks_matched_dispatcher():
    cfg = TaskConfig(
        dispatchers=(
            Dispatcher(
                tables=(TableRule("other", "*"),),
                partition="index-value",
                index_name="nope",
            ),
        )
    )
    # db.t doesn't match the rule carrying the bad index → no error
    verify_tables(cfg, {("db", "t"): _INFO})


# -------------------------------------- rule-resolution wiring (ADVICE 1)


def test_unknown_rule_on_kafka_degrades_to_default_with_warn(spark):
    # event_router.go:237-239: warn + default dispatcher
    cfg = _cfg(partition="shuffle-hash")
    env = _env_df(spark)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dispatch(env, cfg, num_partitions=4, scheme="kafka")
        rows = out.select("schema", "table", "partition").collect()
    assert any("using default" in str(x.message) for x in w)
    # default rule → one partition per (schema, table)
    by_table = {}
    for r in rows:
        by_table.setdefault((r.schema, r.table), set()).add(r.partition)
    assert all(len(v) == 1 for v in by_table.values())


def test_unknown_rule_on_pulsar_is_literal_key_dispatcher(spark):
    # partition/key.go:35-48: every event → partition 0, message key = the
    # configured rule string itself
    cfg = _cfg(partition="shuffle-hash")
    env = _env_df(spark)
    out = dispatch(env, cfg, num_partitions=4, scheme="pulsar")
    rows = out.select("partition", "message_key").collect()
    assert all(r.partition == 0 for r in rows)
    assert all(r.message_key == "shuffle-hash" for r in rows)


def test_rowid_alias_resolves_to_index_value():
    assert resolve_partition_rule("rowid", "kafka") == "index-value"
    assert resolve_partition_rule("ROWID", "pulsar") == "index-value"


def test_literal_key_columns_pair(spark):
    p, k = literal_key_columns("my-rule")
    row = spark.range(1).select(p.alias("p"), k.alias("k")).first()
    assert (row.p, row.k) == (0, "my-rule")


# --------------------------------------------- ts message key (ADVICE 2)


def test_ts_rule_emits_commit_ts_message_key(spark):
    # ts.go:36 — fmt.Sprintf("%d", row.CommitTs) as the message key, even
    # in inertia mode (the r13 skip left the default 'schema.table')
    cfg = _cfg(partition="ts")
    env = _env_df(spark)
    out = dispatch(env, cfg, num_partitions=4, hash_scheme="inertia")
    rows = out.select("commit_ts", "partition", "message_key").collect()
    for r in rows:
        assert r.message_key == str(r.commit_ts)
        assert r.partition == r.commit_ts % 4


# ----------------------------------- handle-column plumbing (ADVICE 3)


def test_inertia_index_value_requires_handle_columns():
    with pytest.raises(ValueError, match=r"requires explicit handle_columns"):
        partition_column("index-value", 16, hash_scheme="inertia")
    with pytest.raises(ValueError, match=r"handle_columns"):
        inertia_message_key("index-value")


def test_dispatch_inertia_index_value_requires_table_infos(spark):
    env = _env_df(spark)
    with pytest.raises(ValueError, match=r"needs table_infos"):
        dispatch(env, _cfg(), num_partitions=4, hash_scheme="inertia")


def test_dispatch_resolves_per_table_handle_columns(spark):
    # t1's handle key is 'a', t2's is 'b' — same rule, different columns
    infos = {
        ("db", "t1"): TableKeyInfo(
            columns=("a", "b"), handle_columns=("a",), indexes={}
        ),
        ("db", "t2"): TableKeyInfo(
            columns=("a", "b"), handle_columns=("b",), indexes={}
        ),
        ("db", "other"): TableKeyInfo(
            columns=("a", "b"), handle_columns=("a",), indexes={}
        ),
    }
    env = _env_df(spark)
    out = dispatch(
        env, _cfg(), num_partitions=16, hash_scheme="inertia",
        table_infos=infos,
    )
    got = {
        r.table: (r.partition, r.message_key)
        for r in out.select("table", "partition", "message_key").collect()
    }
    exp = _env_df(spark).select(
        "table",
        F.pmod(inertia_sum32(("a",)), F.lit(16)).cast("int").alias("pa"),
        inertia_sum32(("a",)).cast("string").alias("ka"),
        F.pmod(inertia_sum32(("b",)), F.lit(16)).cast("int").alias("pb"),
        inertia_sum32(("b",)).cast("string").alias("kb"),
    ).collect()
    for r in exp:
        if r.table == "t2":
            assert got[r.table] == (r.pb, r.kb)
        else:
            assert got[r.table] == (r.pa, r.ka)


def test_dispatch_named_index_uses_index_order(spark):
    # index columns (b, a) — b FIRST, unlike the table's column order
    infos = {
        ("db", t): TableKeyInfo(
            columns=("a", "b"),
            handle_columns=("a",),
            indexes={"uk_ba": (("b", "a"), True)},
        )
        for t in ("t1", "t2", "other")
    }
    env = _env_df(spark)
    out = dispatch(
        env,
        _cfg(index_name="uk_ba"),
        num_partitions=16,
        hash_scheme="inertia",
        table_infos=infos,
    )
    got = out.select("partition", "message_key").collect()
    exp = _env_df(spark).select(
        F.pmod(inertia_sum32(("b", "a")), F.lit(16)).cast("int").alias("p"),
        inertia_sum32(("b", "a")).cast("string").alias("k"),
    ).collect()
    assert [(r.partition, r.message_key) for r in got] == [
        (r.p, r.k) for r in exp
    ]


def test_dispatch_unlisted_table_raises_at_execution(spark):
    # index_value.go:70-76 — dispatch-time ErrDispatcherFailed analog
    infos = {
        ("db", "t1"): TableKeyInfo(
            columns=("a",), handle_columns=("a",), indexes={}
        ),
    }
    env = _env_df(spark)
    out = dispatch(
        env, _cfg(), num_partitions=4, hash_scheme="inertia",
        table_infos=infos,
    )
    with pytest.raises(Exception, match=r"no key metadata for table"):
        out.select("partition").collect()


# ------------------------------- binary / float key columns (ADVICE 4)


def test_binary_key_column_hashes_raw_bytes(spark):
    # Go hashes string([]byte) raw (sink.go:1056-1057); 0xFF 0xFE is not
    # valid UTF-8 — a cast-to-string decode would mangle it
    raw = bytes([0xFF, 0xFE, 0x01, 0x41])
    schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField(
                "before",
                T.StructType([T.StructField("k", T.BinaryType())]),
            ),
            T.StructField(
                "after",
                T.StructType([T.StructField("k", T.BinaryType())]),
            ),
        ]
    )
    df = spark.createDataFrame([("s", "t", None, (raw,))], schema)
    got = df.select(
        inertia_sum32(("k",), dtypes={"k": "binary"}).alias("h")
    ).first()["h"]
    expected = zlib.crc32(b"st") ^ zlib.crc32(b"k" + raw)
    assert got == expected


def test_float_key_column_warns(spark):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        inertia_sum32(("x",), dtypes={"x": "double"})
    assert any("float key column" in str(x.message) for x in w)


# ------------------------------ large-message AdjustAndValidate (#3)


def test_large_message_validate_matrix():
    from tiflow_spark.codecs.large_message import (
        LargeMessageHandleConfig as C,
    )
    from tiflow_spark.codecs.large_message import adjust_and_validate as v

    # empty option/compression adjust to defaults (large_message.go:48-55)
    adj = v(C(large_message_handle_option="",
              large_message_handle_compression=""), "open-protocol")
    assert adj.large_message_handle_option == "none"
    assert adj.large_message_handle_compression == "none"
    # unsupported compression errors even with option=none (:57-61)
    with pytest.raises(
        ValueError,
        match=r"large message handle compression is not supported, got zstd",
    ):
        v(C(large_message_handle_compression="zstd"), "open-protocol")
    # option=none skips the protocol gate entirely (:62-64)
    v(C(), "craft")
    # canal-json requires enable-tidb-extension (:67-73)
    with pytest.raises(
        ValueError, match=r"but enable-tidb-extension is false"
    ):
        v(C(large_message_handle_option="handle-key-only"), "canal-json")
    v(
        C(large_message_handle_option="handle-key-only"),
        "canal-json",
        enable_tidb_extension=True,
    )
    # unsupported protocol (:74-78)
    with pytest.raises(ValueError, match=r"it's not supported"):
        v(C(large_message_handle_option="claim-check",
            claim_check_storage_uri="s3://cc"), "avro")
    # claim-check with empty storage URI (:81-84)
    with pytest.raises(
        ValueError, match=r"claim-check-storage-uri is empty"
    ):
        v(C(large_message_handle_option="claim-check"), "open-protocol")
    # claim-check-raw-value × open protocol (:85-89)
    with pytest.raises(
        ValueError, match=r"raw value is not supported for the open protocol"
    ):
        v(
            C(
                large_message_handle_option="claim-check",
                claim_check_storage_uri="s3://cc",
                claim_check_raw_value=True,
            ),
            "open-protocol",
        )
    # ...but fine on simple
    v(
        C(
            large_message_handle_option="claim-check",
            claim_check_storage_uri="s3://cc",
            claim_check_raw_value=True,
        ),
        "simple",
    )


def test_create_changefeed_rejects_bad_large_message_uri(spark, tmp_path):
    from tiflow_spark.tools import create_changefeed

    with pytest.raises(
        ValueError, match=r"claim-check-storage-uri is empty"
    ):
        create_changefeed(
            spark,
            "/root/testdata/sf0.001",  # never read — validation rejects first
            TaskConfig(),
            "kafka://broker:9092/topic?protocol=open-protocol"
            "&large-message-handle-option=claim-check",
            str(tmp_path / "wd"),
        )


# -------------------------------------------- DDL topic fallback (#4)


def test_ddl_topic_column_scopes(spark):
    from tiflow_spark.operators.dispatchers import ddl_topic_column

    cfg = TaskConfig(
        dispatchers=(
            Dispatcher(
                tables=(TableRule("*", "events"),),
                partition="default",
                topic="cdc_{schema}_{table}",
            ),
        )
    )
    df = spark.createDataFrame(
        [("db1", "events"), ("db1", "scratch"), ("db1", ""), ("db2", None)],
        "schema string, table string",
    )
    got = {
        (r.schema, r.table): r.topic
        for r in df.withColumn(
            "topic", ddl_topic_column(cfg, "default-topic")
        ).collect()
    }
    assert got[("db1", "events")] == "cdc_db1_events"  # matched template
    assert got[("db1", "scratch")] == "db1.scratch"  # unmatched table-scope
    assert got[("db1", "")] == "default-topic"  # schema-scope DDL
    assert got[("db2", None)] == "default-topic"


# ----------------------------- pulsar topic validation (r14 probe #7)


def test_pulsar_topic_validate_vectors():
    # pinned to expression_pulsar_test.go TestPulsarValidate
    from tiflow_spark.operators.dispatchers import validate_topic_expression

    invalid = [
        "persistent://",
        "persistent://{schema}",
        "persistent://public",
        "persistent://public_test-table",
        "persistent://public/_test-table",
        "persistent_public/test__{table}",
        "persistent://{schema}_{table}",
        "persistent://{schema}/{table}/test/name",
        "persistent://test/{table}/test/name/admin",
        "non-persistent://public/test_{schema}_{table}",
        "non-persistent://public/test {table}_123456aaaa",
        "",
    ]
    valid = [
        "public",
        "_xyz",
        "123456",
        "ABCD",
        "persistent:public_test-table",
        "{schema}",
        "AZ_{schema}",
        "{table}_{schema}",
        "123_{schema}_non-persistenttest__{table})",
        "persistent_public_test_{schema}_{table}",
        "persistent{schema}_{table}",
        "persistent://public/default/{schema}_{table}",
        "persistent://public/default/2342-{schema}_abc234",
        "persistent://{schema}/{schema}/2342-{schema}_abc234",
        "persistent://{schema}/dev/2342-{schema}_abc234",
    ]
    for e in invalid:
        with pytest.raises(ValueError):
            validate_topic_expression(e, scheme="pulsar")
    for e in valid:
        validate_topic_expression(e, scheme="pulsar")
    # kafka path is untouched by the scheme switch
    validate_topic_expression("cdc_{schema}_{table}", scheme="kafka")
    with pytest.raises(ValueError):
        validate_topic_expression("bad topic", scheme="kafka")


# -------------------------------- binsearch tuple chunk id (#6)


def test_with_tuple_chunk_id_matches_when_chain(spark):
    import random

    from tiflow_spark.validation.syncdiff import (
        tuple_chunk_id,
        with_tuple_chunk_id,
    )

    rnd = random.Random(14)
    rows = [(rnd.randint(0, 500), rnd.randint(0, 50)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "m long, k long")
    all_bounds = sorted({rows[i] for i in range(0, 2000, 3)})
    # both paths on the SAME bounds: codegen_max=0 forces binsearch while
    # tuple_chunk_id builds the when-chain — at a chain length the plan
    # converter tolerates (a 400-term chain StackOverflows Spark 4's
    # ColumnNodeToExpressionConverter, which is exactly why big bound
    # lists take the binsearch; r14 lowered the default to 32 because the
    # chain's per-invocation analysis+codegen cost is linear in terms)
    bounds = all_bounds[:200]
    big = with_tuple_chunk_id(df, ("m", "k"), bounds, codegen_max=0)
    small = df.withColumn("chunk_id", tuple_chunk_id(("m", "k"), bounds))
    a = sorted((r.m, r.k, r.chunk_id) for r in big.collect())
    b = sorted((r.m, r.k, r.chunk_id) for r in small.collect())
    assert a == b
    # above codegen_max (default 32) the binsearch kicks in on its own;
    # check it against a Python-computed lexicographic count
    bounds = all_bounds[:400]
    out = with_tuple_chunk_id(df, ("m", "k"), bounds)
    got = sorted((r.m, r.k, r.chunk_id) for r in out.collect())
    exp = sorted(
        (m, k, sum(1 for b in bounds if (m, k) > b)) for m, k in rows
    )
    assert got == exp


def test_with_tuple_chunk_id_10k_bounds_no_codegen_blowup(spark):
    # a 10k-term when-chain would hit the JVM 64KB method limit / minutes
    # of codegen; the binsearch path must both PLAN small and run fast
    from tiflow_spark.validation.syncdiff import with_tuple_chunk_id

    bounds = [(i * 7, i % 13) for i in range(10_000)]
    df = spark.createDataFrame(
        [(i * 11, i % 13) for i in range(500)], "m long, k long"
    )
    out = with_tuple_chunk_id(df, ("m", "k"), bounds)
    # plan stays O(log n): the bounds ride as ONE broadcast array, not as
    # 10k expression terms
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("CASE WHEN") < 200
    import bisect

    got = {(r.m, r.k): r.chunk_id for r in out.collect()}
    for i in range(500):
        key = (i * 11, i % 13)
        assert got[key] == bisect.bisect_left(bounds, key), key


def test_with_tuple_chunk_id_null_bounds_binsearch(spark):
    # NULL bound components: the when-chain's SQL three-valued compare
    # makes a null component read as +∞ in its position — a
    # (None, 0) bound is below NO row, a (5, None) bound is below
    # exactly the m > 5 rows. The binsearch re-sorts nulls-last
    # internally, so it gives the same counts even when the caller's
    # list arrives nulls-first (Spark's ascending sort default).
    from tiflow_spark.validation.syncdiff import with_tuple_chunk_id

    df = spark.createDataFrame(
        [(1, 1), (5, 5), (6, 0), (400, 1)], "m long, k long"
    )
    bounds = [(None, 0), (5, None)] + [(i, i) for i in range(1, 400)]
    out = with_tuple_chunk_id(df, ("m", "k"), bounds, codegen_max=10)
    got = {(r.m, r.k): r.chunk_id for r in out.collect()}

    def expected(m, k):
        n = sum(1 for b in bounds[2:] if (m, k) > b)
        return n + (1 if m > 5 else 0)  # (5,None) counts iff m>5

    for m, k in [(1, 1), (5, 5), (6, 0), (400, 1)]:
        assert got[(m, k)] == expected(m, k), (m, k)


# ----------------------------------- storage sentinel default (ADVICE 5)


def test_storage_header_mode_rejects_explicit_default_rotation(spark, tmp_path):
    from tiflow_spark.codecs.csv_codec import CsvConfig
    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        write_storage_sink,
    )

    env = _env_df(spark).withColumn("seq", F.col("commit_ts"))
    csv = CsvConfig(output_field_header=True)
    # explicit 100_000 — the old magic-number compare let this through
    with pytest.raises(ValueError, match=r"output-field-header disables"):
        write_storage_sink(
            env,
            str(tmp_path / "s1"),
            StorageSinkConfig(csv=csv, max_records_per_file=100_000),
        )
    # untouched default (None) still works in header mode
    write_storage_sink(
        env, str(tmp_path / "s2"), StorageSinkConfig(csv=csv)
    )


# -------------------- CSV output-old-value D-before-I file order (probe #7)


def test_csv_old_value_file_order_d_before_i(spark, tmp_path):
    """The reference encodes an update's pre-image row BEFORE its
    post-image row inside one message (csv_message.go:107-116). In the
    storage sink the two halves share (commit_ts, seq) and Spark's sort
    is not stable, so encode_csv's `pos` column (0 = D, 1 = I) must ride
    the file sort — a consumer replaying I-then-D would delete the row.
    Many same-key updates stress the tiebreaker."""
    import glob as _glob

    from tiflow_spark.codecs.csv_codec import CsvConfig
    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        write_storage_sink,
    )

    rows = [
        ("U", "db", "t1", 500 + i, (i, "old"), (i, "new"))
        for i in range(200)
    ]
    env = _env_df(spark, rows).withColumn(
        "seq", F.col("commit_ts") - 500
    )
    cfg = StorageSinkConfig(
        csv=CsvConfig(output_old_value=True, quote="")
    )
    write_storage_sink(env, str(tmp_path / "s"), cfg)
    files = _glob.glob(str(tmp_path / "s" / "db" / "t1" / "**" / "*.csv"),
                       recursive=True)
    assert files
    lines = []
    for f in sorted(files):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 400
    # strict alternation D,I,D,I... — every pre-image precedes its
    # post-image within the event's (commit_ts, seq) slot
    ops = [ln.split(",")[0] for ln in lines]
    assert ops == ["D", "I"] * 200
    for d_line, i_line in zip(lines[::2], lines[1::2]):
        d, i = d_line.split(","), i_line.split(",")
        assert d[-1] == "old" and i[-1] == "new"
        assert d[-2] == i[-2]  # same event's id on both halves
        # is-update meta column is true on BOTH halves
        assert d[4] == "true" and i[4] == "true"


# --------------- create-time topic-expression validation in the facade


def test_create_changefeed_rejects_bad_topic_template(spark, tmp_path):
    """NewEventRouter validates every dispatch rule's topic expression at
    changefeed create (event_router.go:54-66 → validateTopicExpression
    :263-274) — the facade must reject a malformed template before
    anything is encoded."""
    from tiflow_spark.streaming.pipeline import ENVELOPE_SCHEMA
    from tiflow_spark.tools import create_changefeed

    src = str(tmp_path / "src")
    _env_df(spark).withColumn(
        "seq", F.col("commit_ts")
    ).select(
        "op", "schema", "table", "commit_ts", "seq", "before", "after"
    ).write.parquet(src)
    spark.read.schema(ENVELOPE_SCHEMA).parquet(src)  # schema sanity
    cfg = TaskConfig(
        dispatchers=(
            Dispatcher(
                tables=(TableRule("*", "*"),),
                partition="default",
                topic="bad topic!{schema}",  # space + '!' both forbidden
            ),
        )
    )
    with pytest.raises(ValueError, match="topic expression"):
        create_changefeed(
            spark,
            src,
            cfg,
            "kafka://broker/events?protocol=canal-json",
            str(tmp_path / "wd"),
        )
    # avro additionally requires BOTH placeholders
    cfg2 = TaskConfig(
        dispatchers=(
            Dispatcher(
                tables=(TableRule("*", "*"),),
                partition="default",
                topic="just-{schema}",
            ),
        )
    )
    with pytest.raises(ValueError, match="topic expression"):
        create_changefeed(
            spark,
            src,
            cfg2,
            "kafka://broker/events?protocol=avro",
            str(tmp_path / "wd2"),
        )


# ------------------- codec Config.Validate matrix (config.go:344-424)


def test_codec_config_validate_matrix():
    from tiflow_spark.codecs.codec_config import (
        CodecConfig,
        validate_codec_config,
    )
    from tiflow_spark.codecs.large_message import LargeMessageHandleConfig

    # avro: registry exactly-one
    with pytest.raises(ValueError, match="requires parameter"):
        validate_codec_config(CodecConfig(protocol="avro"))
    with pytest.raises(ValueError, match="requires only one"):
        validate_codec_config(
            CodecConfig(
                protocol="avro",
                avro_confluent_schema_registry="http://r",
                avro_glue_schema_registry="glue-reg",
            )
        )
    # handling-mode value checks
    with pytest.raises(ValueError, match="avro-decimal-handling-mode"):
        validate_codec_config(
            CodecConfig(
                protocol="avro",
                avro_confluent_schema_registry="http://r",
                avro_decimal_handling_mode="exact",
            )
        )
    with pytest.raises(
        ValueError, match="avro-bigint-unsigned-handling-mode"
    ):
        validate_codec_config(
            CodecConfig(
                protocol="avro",
                avro_confluent_schema_registry="http://r",
                avro_bigint_unsigned_handling_mode="decimal",
            )
        )
    # row-checksum consistency: needs tidb-extension + both modes string
    with pytest.raises(ValueError, match="row level checksum"):
        validate_codec_config(
            CodecConfig(
                protocol="avro",
                avro_confluent_schema_registry="http://r",
                enable_row_checksum=True,
            )
        )
    validate_codec_config(
        CodecConfig(
            protocol="avro",
            avro_confluent_schema_registry="http://r",
            enable_row_checksum=True,
            enable_tidb_extension=True,
            avro_decimal_handling_mode="string",
            avro_bigint_unsigned_handling_mode="string",
        )
    )
    # positivity
    with pytest.raises(ValueError, match="invalid max-message-bytes"):
        validate_codec_config(CodecConfig(max_message_bytes=0))
    with pytest.raises(ValueError, match="invalid max-batch-size"):
        validate_codec_config(CodecConfig(max_batch_size=-1))
    # tidb-extension on an unsupported protocol warns but does NOT error
    # (config.go:345-352 logs and ignores)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        validate_codec_config(
            CodecConfig(protocol="maxwell", enable_tidb_extension=True)
        )
    assert any("enable-tidb-extension" in str(x.message) for x in w)
    # nested large-message block adjusts ('' -> 'none') and validates
    out = validate_codec_config(
        CodecConfig(
            protocol="open-protocol",
            large_message_handle=LargeMessageHandleConfig(
                large_message_handle_option=""
            ),
        )
    )
    assert out.large_message_handle.large_message_handle_option == "none"
    with pytest.raises(ValueError, match="claim-check-storage-uri is empty"):
        validate_codec_config(
            CodecConfig(
                protocol="open-protocol",
                large_message_handle=LargeMessageHandleConfig(
                    large_message_handle_option="claim-check"
                ),
            )
        )


def test_create_changefeed_rejects_avro_without_registry(spark, tmp_path):
    from tiflow_spark.streaming.pipeline import ENVELOPE_SCHEMA
    from tiflow_spark.tools import create_changefeed

    src = str(tmp_path / "src")
    _env_df(spark).withColumn("seq", F.col("commit_ts")).select(
        "op", "schema", "table", "commit_ts", "seq", "before", "after"
    ).write.parquet(src)
    cfg = TaskConfig(
        dispatchers=(
            Dispatcher(tables=(TableRule("*", "*"),), partition="default"),
        )
    )
    with pytest.raises(ValueError, match="schema registry"):
        create_changefeed(
            spark,
            src,
            cfg,
            "kafka://broker/events?protocol=avro",
            str(tmp_path / "wd"),
        )


# ------------- DDL dispatch rule: PartitionZero vs PartitionAll


def test_ddl_partition_rule_by_protocol(spark):
    """getDDLDispatchRule (mq_ddl_sink.go:44-51): canal/canal-json DDL
    goes to partition 0 only; every other protocol BROADCASTS the DDL to
    all partitions (SyncBroadcastMessage, :129-136) so a consumer on any
    partition observes schema changes."""
    from tiflow_spark.tools import _mq_encode_ddl

    ddl = spark.createDataFrame(
        [("s", "t", 100, 1, "ALTER TABLE s.t ADD COLUMN c INT",
          "add column")],
        "schema string, table string, commit_ts long, seq long, "
        "query string, ddl_type string",
    )
    zero = _mq_encode_ddl(ddl, "canal-json", num_partitions=6)
    assert [r.partition for r in zero.collect()] == [0]
    bcast = _mq_encode_ddl(ddl, "open-protocol", num_partitions=6)
    parts = sorted(r.partition for r in bcast.collect())
    assert parts == [0, 1, 2, 3, 4, 5]
    # every broadcast copy is byte-identical
    assert bcast.select("value").distinct().count() == 1


def test_bucket_write_parallelism_and_layout(spark, tmp_path):
    """The bucket-partitioned writes pin an explicit shuffle-partition
    count (one task per core, never more than the candidate buckets) so
    AQE cannot size-coalesce a small seed/merge into one task that then
    creates every bucket file sequentially — the write's wall cost is
    per-file, not per-byte. The physical layout contract is unchanged:
    exactly one data file per touched bucket directory."""
    from pyspark.sql import functions as F

    from tiflow_spark.sinks.bucketed import (
        _bucket_write_partitions,
        merge_hash_bucketed,
        read_state,
    )

    par = spark.sparkContext.defaultParallelism
    assert _bucket_write_partitions(spark, 10_000) == par
    assert _bucket_write_partitions(spark, 3) == 3
    assert _bucket_write_partitions(spark, 0) == 1

    n_buckets = max(4 * par, 64)  # more buckets than cores
    chg = spark.range(2000).select(
        F.lit("I").alias("op"),
        F.lit("t1").alias("target_table"),
        F.col("id").cast("string").alias("key"),
        F.lit(100).alias("commit_ts"),
        F.col("id").alias("seq"),
        F.col("id").alias("id"),
    )
    target = str(tmp_path / "target")
    merge_hash_bucketed(chg, target, n_buckets=n_buckets, batch_id=0)
    import os

    dirs = [d for d in os.listdir(target) if d.startswith("bucket=")]
    assert len(dirs) > par  # the seed really spanned many buckets
    for d in dirs:
        files = [
            f
            for f in os.listdir(os.path.join(target, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d} has {len(files)} files"
    assert read_state(spark, target).count() == 2000


def test_claim_check_encode_renders_once(spark):
    """The staged-projection form of the claim-check encoders must keep
    the full-message render as a separate pipeline stage (aliases _fv /
    _full), so it is evaluated once per row instead of once per
    conditional output branch (codegen CSE does not hoist expressions
    that appear only under different CaseWhen branches — measured 3x on
    the open encode). If CollapseProject ever starts inlining these
    aliases again, the staged attribute disappears from the optimized
    plan and this test catches the (silent, correctness-preserving)
    performance regression."""
    from pyspark.sql import functions as F

    from tiflow_spark.codecs.large_message import claim_check_canal_envelope
    from tiflow_spark.codecs.open_protocol import encode_open_claim_check

    env = spark.createDataFrame(
        [("s", "t", 100, 1, "I", None, (1, 2.0, "x" * 400))],
        "schema string, table string, commit_ts long, seq long, op string, "
        "before struct<id:bigint,balance:double,note:string>, "
        "after struct<id:bigint,balance:double,note:string>",
    )
    for df, alias in (
        (encode_open_claim_check(env, 121, "claim"), "_fv"),
        (claim_check_canal_envelope(env, 121, "claim"), "_full"),
    ):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert f"{alias}#" in optimized, (
            f"staged render alias {alias} was collapsed out of the plan"
        )
        row = df.collect()[0]
        assert row.is_claim and row.claim_location.startswith("claim/")


def test_ingest_batch_concurrent_writes_replay_idempotent(spark, tmp_path):
    """The three per-batch state writes now run concurrently from a
    driver thread pool; each dir commit stays an independent atomic
    rename, so a replayed batch id must still REPLACE its own output
    (never duplicate) and decisions must be unchanged across the replay."""
    from pyspark.sql import functions as F

    from tiflow_spark.streaming.llm_ingest import (
        ingest_batch,
        init_ingest_state,
        read_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"doc body {'common ' * 30}{i % 4}", "xx", "s", 10)
         for i in range(40)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    state = str(tmp_path / "state")
    init_ingest_state(spark, state)
    # leak check is RELATIVE to the session's pre-existing cache (the
    # suite shares one Spark session and other operators persist by
    # design), so assert ingest_batch adds no NET persisted RDDs rather
    # than that the whole session is cache-free
    persisted = spark.sparkContext._jsc.sc().getPersistentRDDs().size
    before = persisted()
    ingest_batch(spark, docs, 0, state)
    first = sorted(r.doc_id for r in read_corpus(spark, state).collect())
    ingest_batch(spark, docs, 0, state)  # crash-replay of the same batch
    second = sorted(r.doc_id for r in read_corpus(spark, state).collect())
    assert first == second
    # no cache leak: every per-batch persist was released
    import os
    assert persisted() <= before, "ingest_batch leaked persisted RDDs"
    # exactly one committed dir per subdir (replaced, not duplicated)
    for sub in ("corpus", "index_sh", "index_banded"):
        dirs = [d for d in os.listdir(os.path.join(state, sub))
                if d.startswith("batch-") and not d.endswith(".staging")]
        assert dirs == ["batch-0"]


def test_semdedup_assignment_cached_once(spark):
    """semdedup_pairs persists the seeded assignment so the k x dims
    integer-L2 argmin projection is evaluated once, not once per
    consumer (both self-join sides + the cluster-stats aggregate)."""
    from tiflow_spark.llm.clustering import semdedup_pairs

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    pairs = semdedup_pairs(emb, threshold=0.0, k=2, max_cluster=64)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, (
        "semdedup assignment is no longer cached — the argmin projection "
        "would run once per join branch again"
    )
    assert pairs.count() > 0


def test_duplicate_groups_sizes_without_corpus_window(spark):
    """duplicate_groups derives group_size from the (bounded) component
    frame and joins it back — the full-corpus window partitioned by
    group_id is gone from the final assembly, and semantics are pinned:
    sizes count every corpus member of the group, singletons stay 1."""
    from tiflow_spark.llm.dedup import duplicate_groups

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    corpus = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 7)], "doc_id long"
    )
    out = duplicate_groups(pairs, corpus)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # r15: group_size is a count-window over the BOUNDED component frame
    # (paired docs only, a post-checkpoint LogicalRDD) — one window, and
    # its child must be that LogicalRDD, never the corpus join (whose
    # window would shuffle every mostly-singleton doc on group_id, the
    # r14 regression this test pins out).
    import re

    windows = re.findall(
        r"Window [^\n]*\n\s*\+- (?:Project [^\n]*\n\s*\+- )?(\w+)", plan
    )
    assert len(windows) <= 1, plan
    assert all(child == "LogicalRDD" for child in windows), (
        "group_size window must sit directly over the checkpointed "
        f"component frame, got children {windows}"
    )
    got = {
        r.doc_id: (r.group_id, r.group_size, r.is_representative)
        for r in out.collect()
    }
    assert got == {
        1: (1, 2, True), 2: (1, 2, False),
        3: (3, 3, True), 4: (3, 3, False), 5: (3, 3, False),
        7: (7, 1, True),
    }


def test_minhash_index_banded_cached_when_branched(spark):
    """minhash_index persists the banded frame whenever it feeds more
    than one branch (stats aggregate / cap join / caller merges), so the
    shingle->minhash pipeline runs once per invocation, not per branch —
    and the cap join keeps its statistics (stays broadcast)."""
    from tiflow_spark.llm.dedup import minhash_index

    docs = spark.createDataFrame(
        [(i, f"some shared text body number {i % 3} repeated")
         for i in range(12)],
        "doc_id long, text string",
    )
    # the uncached default path (single consumer) is a pure plan —
    # checked FIRST: once the branched variant below persists, the cache
    # manager would substitute the shared subtree into this plan too
    _, plain = minhash_index(docs, 16, 4)
    assert "InMemoryRelation" not in (
        plain._jdf.queryExecution().optimizedPlan().toString()
    )
    _, banded, stats = minhash_index(docs, 16, 4, max_bucket=2,
                                     with_stats=True)
    plan = banded._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, (
        "banded is no longer cached — the signature pipeline would "
        "re-run once per plan branch"
    )
    banded.unpersist()


def test_product_profit_ps_build_prefiltered(spark, sf_dir):
    """product_profit's partsupp-analog aggregate is built over the
    widget-filtered lineitem slice (broadcast LEFT SEMI before the
    (partkey, suppkey) exchange), not the full table — result-identical
    under the inner join, and the plan pins the semi join."""
    from tiflow_spark.plans.analytics import product_profit

    df = product_profit(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, (
        "the ps aggregate shuffles the FULL lineitem again — the widget "
        "pre-filter before the exchange is gone"
    )


def test_resumable_compare_pool_covers_all_batches(spark, sf_dir, tmp_path):
    """The no-crash path runs pending batches from a small thread pool;
    every batch file must still be committed and the result must equal
    the direct compare (commit protocol unchanged)."""
    from tiflow_spark.envelope import load_table
    from tiflow_spark.validation.syncdiff import (
        compare_checksums,
        resumable_chunk_compare,
    )

    cols = ["c_custkey", "c_name", "c_acctbal"]
    src = load_table(spark, sf_dir, "customer")
    done: list[int] = []
    got = resumable_chunk_compare(
        spark, src, src, "c_custkey", cols, 16, str(tmp_path / "ck"),
        chunks_per_batch=1, computed_batches=done,
    )
    import os
    batch_files = [f for f in os.listdir(tmp_path / "ck")
                   if f.startswith("batch_")]
    assert len(batch_files) == len(done) and len(done) > 3
    assert sorted(done) == list(range(len(done)))
    direct = compare_checksums(src, src, "c_custkey", cols, 16)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_kmeans_lloyd_assignment_cached_once(spark):
    """kmeans_lloyd persists the seeded assignment so the argmin
    projection is computed once, not once per consumer (centroid-sums
    collect + the final reassignment select)."""
    from tiflow_spark.llm.clustering import kmeans_lloyd

    emb = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 7) for j in range(8)]) for i in range(32)],
        "vec_id bigint, embedding array<double>",
    )
    out = kmeans_lloyd(emb, k=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, (
        "the seeded assignment is no longer cached — the argmin would "
        "run once per branch again"
    )
    assert out.count() == 32


def test_registry_rows_annotation_matches_collect_path(spark):
    """registry_from_ddl annotates the returned frame with its
    driver-side rows so metadata consumers skip a collect job; any frame
    WITHOUT the annotation (e.g. after a transformation) must take the
    collect fallback and produce the identical column plan."""
    from tiflow_spark.sources.ddl_stream import registry_from_ddl
    from tiflow_spark.sources.schema_registry import registry_column_plan

    ddl = spark.createDataFrame(
        [
            ("DDL", "db", "t1", 100, 0, "create table",
             "CREATE TABLE t1 (id BIGINT PRIMARY KEY, note VARCHAR)"),
            ("DDL", "db", "t1", 200, 1, "add column",
             "ALTER TABLE t1 ADD COLUMN extra DOUBLE DEFAULT 1.5"),
        ],
        "op string, schema string, table string, commit_ts long, "
        "seq long, ddl_type string, query string",
    )
    reg = registry_from_ddl(ddl)
    assert getattr(reg, "_tiflow_registry_rows", None), (
        "registry frame lost its driver-rows annotation"
    )
    fast = registry_column_plan(reg)
    # .select drops Python-side attributes → exercises the collect path
    slow = registry_column_plan(reg.select("*"))
    assert fast == slow
    assert [c for c, _ in fast] == ["id", "note", "extra"]


def test_shared_pass_index_compact_equals_two_pass_build(spark):
    """The r14 one-shared-minhash-pass construction used by
    q_dedup_index_compact (one banded pass over the full corpus,
    doc_id-filtered per side, stats/cap via banded_bucket_stats /
    cap_banded) must be row-identical to building base and batch with
    two separate minhash_index calls — banding is per-doc
    deterministic."""
    from pyspark.sql import functions as F

    from tiflow_spark.llm.dedup import (
        banded_bucket_stats,
        cap_banded,
        compact_lsh_index,
        merge_lsh_stats,
        minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon zeta {i % 4} tail words")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    split = 10
    # two-pass reference construction (the pre-r14 query shape)
    _, idx_capped_2p, base_stats_2p = minhash_index(
        corpus.filter(F.col("doc_id") < split), 16, 4, max_bucket=2,
        with_stats=True,
    )
    _, batch_banded_2p, batch_stats_2p = minhash_index(
        corpus.filter(F.col("doc_id") >= split), 16, 4, with_stats=True
    )
    two_pass = compact_lsh_index(
        idx_capped_2p.unionByName(batch_banded_2p),
        2,
        stats=merge_lsh_stats(base_stats_2p, batch_stats_2p),
    )
    # shared-pass construction
    _, banded_all = minhash_index(corpus, 16, 4)
    banded_all = banded_all.persist()
    try:
        base_banded = banded_all.filter(F.col("doc_id") < split)
        batch_banded = banded_all.filter(F.col("doc_id") >= split)
        base_stats = banded_bucket_stats(base_banded)
        batch_stats = banded_bucket_stats(batch_banded)
        shared = compact_lsh_index(
            cap_banded(base_banded, base_stats, 2).unionByName(batch_banded),
            2,
            stats=merge_lsh_stats(base_stats, batch_stats),
        )
        assert shared.exceptAll(two_pass).count() == 0
        assert two_pass.exceptAll(shared).count() == 0
    finally:
        banded_all.unpersist()


# ------------------------- binsearch round collapse + pushed range preds


def test_bin_search_fold_matches_per_level_rounds(spark, sf_dir):
    """The r14 round collapse (one leaf-granularity aggregation + exact
    driver-side dyadic fold — COUNT sums, BIT_XOR is associative) must
    find exactly the rows the classic per-level job loop finds, which in
    turn must equal the direct full row compare."""
    from tiflow_spark.plans.parity import (
        CUSTOMER_COLS,
        _corrupt_customer,
        load_table,
    )
    from tiflow_spark.validation.syncdiff import bin_search_diff, row_diff

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt_customer(spark, sf_dir)
    folded = bin_search_diff(src, dst, "c_custkey", CUSTOMER_COLS,
                             min_width=64)  # default: fold kicks in
    classic = bin_search_diff(src, dst, "c_custkey", CUSTOMER_COLS,
                              min_width=64, leaf_agg_max=0)  # never folds
    direct = row_diff(src, dst, "c_custkey", CUSTOMER_COLS)
    f = folded.select("c_custkey", "kind")
    c = classic.select("c_custkey", "kind")
    d = direct.select("c_custkey", "kind")
    assert f.exceptAll(c).count() == 0 and c.exceptAll(f).count() == 0
    assert f.exceptAll(d).count() == 0 and d.exceptAll(f).count() == 0


def test_rid_range_pred_pushes_down_and_matches_isin(spark, sf_dir):
    """_rid_range_pred must select exactly the rows of the derived-column
    floor-div isin AND reach the parquet scan as PushedFilters (the
    derived form never pushes — guide §6)."""
    import io
    import re
    from contextlib import redirect_stdout

    from tiflow_spark.plans.parity import load_table
    from tiflow_spark.validation.syncdiff import _rid_range_pred

    cust = load_table(spark, sf_dir, "customer")
    lo, width, rids = 7, 256, {0, 2, 3, 9}
    pred = _rid_range_pred("c_custkey", lo, width, rids)
    old = (
        ((F.col("c_custkey") - lo).cast("long") / width)
        .cast("long")
        .isin(*rids)
    )
    a, b = cust.filter(pred), cust.filter(old & (F.col("c_custkey") >= lo))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        a.explain("formatted")
    m = re.search(r"PushedFilters: \[(.*?)\]", buf.getvalue())
    assert m and "c_custkey" in m.group(1), buf.getvalue()[:2000]


# ---------------- r14 session-5 plan pins: single-render replay + shingle-once


def test_typed_replay_single_parse_no_inline_render(spark, sf_dir):
    """consumer_replay_debezium_typed materializes the encoded messages
    (localCheckpoint) before decoding: without it, pushing the op filter
    below the decode re-inlines the full 16-column render + from_json
    parse into the filter condition (measured 27 s vs 3.3 s at sf0.1).
    The replay plan must carry at most one from_json and ZERO render
    (StructsToJson) nodes — the render lives behind the checkpoint."""
    import io
    from contextlib import redirect_stdout

    from tiflow_spark.plans.parity import REGISTRY

    fn, _ = REGISTRY["consumer_replay_debezium_typed"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert plan.lower().count("structstojson") == 0, plan[:1500]
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan


def test_ngram_jaccard_shingles_once(spark, sf_dir):
    """ngram_jaccard_pairs shingles once into a persisted array frame;
    all four consumer branches (stop-shingle df agg, sizes, both join
    sides) must read the cache instead of re-running split+zip_with."""
    from tiflow_spark.llm.dedup import corpus_with_dups, ngram_jaccard_pairs
    from tiflow_spark.plans.parity import _docs

    df = ngram_jaccard_pairs(
        corpus_with_dups(_docs(spark, sf_dir)), 0.5, max_df=128
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, plan[:1500]


def test_minhash_sql_string_mixes_match_column_built_form(spark):
    """_signatures_from_shingles builds each of the k universal-family
    mixes as ONE parsed SQL expression (plan-construction cost: ~0.2 s of
    py4j round-trips saved per invocation, r14 session 6). The parsed
    tree must stay bit-identical to the Column-by-Column form it
    replaced — int-literal coefficients promote to BIGINT in the
    products, pmod against the BIGINT Mersenne literal."""
    from tiflow_spark.llm.dedup import (
        _M61,
        _minhash_coeffs,
        _signatures_from_shingles,
        portable_hash64,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "beta gamma delta epsilon zeta eta"),
            (3, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s")
    )
    new = _signatures_from_shingles(sh, 8)
    h = portable_hash64(F.col("s"))
    halves = sh.select(
        "doc_id",
        F.pmod(h, F.lit(1 << 30)).alias("hL"),
        F.shiftright(h, 30).alias("hH"),
    )
    old = halves.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.lit(a) * F.col("hL")
                    + F.lit(c) * F.col("hH")
                    + F.lit(b),
                    F.lit(_M61),
                )
            ).alias(f"mh_{i}")
            for i, (a, c, b) in enumerate(_minhash_coeffs(8))
        ]
    )
    assert new.schema == old.schema
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_layout_scan_recursive_listing_is_version_exact(spark, tmp_path):
    """read_storage_sink lists with ONE recursive walk instead of 4-level
    glob expansion (glob construct cost ~4.5 s on a ~2000-file layout,
    r14 session 6). The scan must still match EXACTLY what the glob
    matched: CDC*.{ext} at {schema}/{table}/{version}/{date}/ for the
    config's table_version only — meta/ files, other versions and stray
    files excluded."""
    import os

    from pyspark.sql import types as T

    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        read_storage_sink,
    )

    base = str(tmp_path / "layout")
    d1 = os.path.join(base, "db", "t", "1", "2024-01-01")
    d2 = os.path.join(base, "db", "t", "2", "2024-01-01")  # other version
    meta = os.path.join(base, "db", "t", "meta")
    os.makedirs(d1), os.makedirs(d2), os.makedirs(meta)
    row = (
        '{"id":[1],"database":"db","table":"t","pkNames":["id"],'
        '"isDdl":false,"type":"INSERT","es":1000,"ts":1000,'
        '"sql":"","sqlType":{"id":-5},"mysqlType":{"id":"bigint"},'
        '"old":null,"data":[{"id":"1"}]}'
    )
    with open(os.path.join(d1, "CDC000001.json"), "w") as fh:
        fh.write(row + "\n")
    with open(os.path.join(d2, "CDC000001.json"), "w") as fh:
        fh.write(row.replace('"id":"1"', '"id":"2"') + "\n")
    with open(os.path.join(meta, "CDC.index"), "w") as fh:
        fh.write("CDC000001.json\n")
    with open(os.path.join(d1, "stray.json"), "w") as fh:
        fh.write(row + "\n")
    payload = T.StructType([T.StructField("id", T.LongType())])
    cfg = StorageSinkConfig(protocol="canal-json", table_version=1)
    got = read_storage_sink(spark, base, payload, cfg).select("id").collect()
    assert [r.id for r in got] == [1]
