"""MQ consumer replay — cmd/kafka-consumer re-expressed on the engine.

The reference ships a consumer binary that reads a changefeed's Kafka
topic, decodes the protocol, regroups events per table, and applies them
to a downstream MySQL so sync_diff can prove the topic carries the full
change stream (cmd/kafka-consumer/, tests/mq_protocol_tests/). Here the
same round trip is: file-broker segments → per-partition offset order →
canal-json decode → typed images → last-writer-wins fold → applied state.

Correctness contract (same as the reference consumer):
- the producer dispatches key-sticky (index-value/table dispatchers), so
  one key's events share a partition and its offsets preserve dispatch
  order — the fold orders by (es, offset), which is total per key;
- canal-json `es` is millisecond-truncated; offsets break ms ties, which
  is exactly the information a Kafka consumer has.

Scale shape: broker scan prunes by topic; decode is one from_json map
stage; the fold is one shuffle keyed by (table, key). No driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: canal-json message shape (pkg/sink/codec/canal; decoder parity with
#: codecs/canal_json.decode_canal_json, plus consumer-side columns)
_CANAL_SCHEMA = (
    "id BIGINT, database STRING, table STRING, pkNames ARRAY<STRING>, "
    "isDdl BOOLEAN, type STRING, es BIGINT, ts BIGINT, sql STRING, "
    "sqlType MAP<STRING,INT>, mysqlType MAP<STRING,STRING>, "
    "data ARRAY<MAP<STRING,STRING>>, old ARRAY<MAP<STRING,STRING>>"
)


def replay_broker_to_state(
    spark: SparkSession,
    broker_dir: str,
    payload_types: dict[str, str] | None = None,
    topic: str | None = None,
    use_tidb_extension: bool = False,
) -> DataFrame:
    """Replay a canal-json topic into the applied table state.

    ``payload_types``: column → Spark type string, used to cast the
    string-valued canal images back to typed columns. ``None`` = derive
    the types from the wire itself: the reference consumer reads every
    column's type from the message's own ``mysqlType`` map
    (canal_json_message.go:332-353 → canalJSONFormatColumn :355-421,
    base type via utils.ExtractBasicMySQLType), which by construction
    tolerates BOTH plain lowercase names and content-compatible FULL
    descriptors ('bigint(20) unsigned'-style, mysql_types.go:36-44 cuts
    at the first '(' or ' '). One single-message driver peek —
    metadata-scale, never the data.

    ``use_tidb_extension``: the topic was produced with
    enable-tidb-extension=true, so every message carries the EXACT
    commit ts in ``_tidb.commitTs`` — the decoder restores it
    (canal_json_decoder.go:248,265-267) and the fold orders by it
    directly instead of the (ms-truncated es, offset) surrogate; a
    message missing the extension fails the replay loudly.

    Output: (schema, table, key, <typed payload...>) — live rows only.
    """
    from tiflow_spark.sinks.mq import consume_file_broker

    schema = _CANAL_SCHEMA
    if use_tidb_extension:
        schema += ", _tidb STRUCT<commitTs: BIGINT>"
    msgs = consume_file_broker(spark, broker_dir, topic)
    m = msgs.select(
        "partition",
        "offset",
        F.from_json("value", schema).alias("m"),
    ).filter(~F.col("m.isDdl"))
    if payload_types is None:
        from tiflow_spark.types import spark_cast_for_mysql_type

        peek = (
            m.select(F.col("m.mysqlType").alias("mt"))
            .filter(F.col("mt").isNotNull())
            .limit(1)
            .collect()
        )
        if not peek:
            raise ValueError(
                "schema-from-wire replay: no DML message with a mysqlType "
                "map found on the topic"
            )
        payload_types = {
            name: spark_cast_for_mysql_type(t)
            for name, t in sorted(peek[0].mt.items())
        }
    img = F.element_at(F.col("m.data"), 1)
    key = F.array_join(
        F.transform(F.col("m.pkNames"), lambda pk: F.element_at(img, pk)),
        "|",
    )
    if use_tidb_extension:
        # decoder parity: the extension is mandatory on an
        # extension-enabled changefeed — null means a foreign message
        es = F.coalesce(
            F.assert_true(
                F.col("m._tidb.commitTs").isNotNull(),
                F.lit("canal replay: message without _tidb.commitTs "
                      "on an extension-enabled topic"),
            ).cast("long"),
            F.col("m._tidb.commitTs"),
        )
    else:
        es = F.col("m.es")
    rows = m.select(
        F.col("m.database").alias("schema"),
        F.col("m.table").alias("table"),
        key.alias("key"),
        F.col("m.type").alias("etype"),
        es.alias("es"),
        "partition",
        "offset",
        *[
            F.element_at(img, name).cast(t).alias(name)
            for name, t in payload_types.items()
        ],
    )
    w = Window.partitionBy("schema", "table", "key").orderBy(
        F.col("es").desc(), F.col("offset").desc()
    )
    # offsets are only comparable WITHIN one broker partition; the
    # ms-truncated `es` tiebreak is sound only under the dispatcher's
    # key-sticky contract (same key → same partition). Enforce it instead
    # of assuming it: a key observed in >1 partition fails the replay
    # loudly rather than silently picking a stale row.  collect_set rides
    # the same window partitioning — no extra shuffle. The assert is
    # folded INTO the row-number filter (null-on-success + coalesce
    # true): a free-standing asserted column that is later .drop()ped is
    # pruned by Catalyst and the guard silently dies (found by a
    # round-9 negative test — the r8 form WAS dead).
    n_parts = F.size(F.collect_set("partition").over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )))
    contract = F.coalesce(
        F.assert_true(
            F.col("_nparts") <= 1,
            F.concat(
                F.lit("replay contract violated: key observed in "
                      "multiple broker partitions: "),
                F.col("schema"), F.lit("."), F.col("table"),
                F.lit("/"), F.col("key"),
            ),
        ).cast("boolean"),
        F.lit(True),
    )
    last = (
        rows.withColumn("_nparts", n_parts)
        .withColumn("_rn", F.row_number().over(w))
        .filter(contract & (F.col("_rn") == 1))
        .drop("_rn", "_nparts", "es", "partition", "offset")
    )
    return last.filter(F.col("etype") != "DELETE").drop("etype")


def replay_simple_broker_with_ddl(
    spark: SparkSession,
    broker_dir: str,
    topic: str | None = None,
) -> DataFrame:
    """Simple-protocol consumer WITH mid-stream schema evolution — the
    capability the protocol's DDL messages exist for (simple/decoder.go
    MessageTypeDDL path feeding the consumer's schema tracker):

    1. split broker messages by the `type` discriminator (DML kinds vs
       DDL kinds vs WATERMARK/BOOTSTRAP);
    2. fold the (metadata-scale) DDL messages into the SAME versioned
       registry the producer uses (registry_from_ddl over the decoded
       `sql` statements — parse-derived kinds, consumer needs no side
       channel);
    3. decode each DML image against the schema AS-OF its commitTs —
       broadcast version-array lookup, typed casts + declared-DEFAULT
       backfill for rows written before an ADD COLUMN;
    4. key rows by the registry's as-of handle key and fold to
       last-writer state ordered by (commitTs, offset).

    Output: (schema, table, key, <typed column universe...>) live rows.
    Scale shape: the DML side is one from_json map stage + the broadcast
    as-of join + one keyed fold shuffle; only DDL messages (bounded like
    the owner's schema storage) are collected.
    """
    from tiflow_spark.codecs.simple import decode_simple, decode_simple_ddl
    from tiflow_spark.sinks.mq import consume_file_broker
    from tiflow_spark.sources.ddl_parse import parse_ddl
    from tiflow_spark.sources.ddl_stream import registry_from_ddl
    from tiflow_spark.sources.schema_registry import (
        asof_resolve,
        registry_column_plan,
        _spark_cast,
    )

    msgs = consume_file_broker(spark, broker_dir, topic)
    kind = F.get_json_object("value", "$.type")
    ddl_msgs = msgs.filter(
        ~kind.isin("INSERT", "UPDATE", "DELETE", "WATERMARK", "BOOTSTRAP")
    )
    dml_msgs = msgs.filter(kind.isin("INSERT", "UPDATE", "DELETE"))

    # DDL side: metadata-scale by the same bound as the reference owner's
    # schema storage; kinds re-derived by parsing the statement itself
    ddl_rows = decode_simple_ddl(ddl_msgs).collect()
    parsed = []
    for i, r in enumerate(sorted(ddl_rows, key=lambda r: r["commit_ts"])):
        op = parse_ddl(r["query"])
        if op is None:
            continue
        parsed.append(
            (
                "DDL",
                r["schema"] or "",
                r["table"] or (op.table or ""),
                int(r["commit_ts"]),
                i,
                op.kind,
                r["query"],
            )
        )
    ddl_frame = spark.createDataFrame(
        parsed,
        "op string, schema string, table string, commit_ts long, seq long, "
        "ddl_type string, query string",
    )
    registry = registry_from_ddl(ddl_frame)
    plan = registry_column_plan(registry)

    dml = decode_simple(
        dml_msgs.select("offset", "value"), extra_cols=("offset",)
    )
    resolved = asof_resolve(
        dml, registry, event_table_col="table", with_keys=True
    )
    img = F.when(F.col("op") == "D", F.col("old_image")).otherwise(
        F.col("image")
    )
    # Declared-default backfill for image-ABSENT keys, keyed per
    # (table, column) from the row's OWN table's latest version — a bare
    # column name is NOT a key: two tables can share a name with
    # different declared defaults, and a column that never existed in
    # the row's table must stay NULL, not inherit another table's
    # default. Latest-version defaults model the downstream DDL apply
    # (ADD COLUMN ... DEFAULT backfills pre-ADD rows — the MySQL-side
    # behavior the reference consumer relies on; caveat shared with any
    # apply-time backfill: a later MODIFY changing only the default does
    # not rewrite already-applied rows downstream). Driver-side collect
    # is metadata-scale like registry_column_plan.
    latest_ver: dict[str, tuple[list, dict]] = {}
    _local = getattr(registry, "_tiflow_registry_rows", None)
    for r in sorted(
        _local
        if _local is not None
        else registry.select(
            "table", "version_no", "columns", "defaults"
        ).collect(),
        key=lambda r: (r.table, r.version_no),
    ):
        latest_ver[r.table] = (list(r.columns or []), dict(r.defaults or {}))
    typed = []
    for c, sql_type in plan:
        t = _spark_cast(sql_type)
        # explicit NULL values stay NULL — backfill only when the key is
        # absent from the image (mounter.go getDefaultOrZeroValue applies
        # to missing columns)
        expr = F.when(
            F.map_contains_key(img, F.lit(c)),
            F.element_at(img, F.lit(c)).cast(t),
        )
        for tbl, (cols, defaults) in latest_ver.items():
            if c in cols:
                expr = expr.when(
                    F.col("table") == tbl,
                    F.lit(defaults.get(c)).cast(t),
                )
        typed.append(expr.otherwise(F.lit(None).cast(t)).alias(c))
    key = F.array_join(
        F.transform(
            F.col("handle_cols"), lambda h: F.element_at(img, h)
        ),
        "|",
    )
    rows = resolved.select(
        "schema", "table", key.alias("key"), "op", "commit_ts", "offset",
        *typed,
    )
    w = Window.partitionBy("schema", "table", "key").orderBy(
        F.col("commit_ts").desc(), F.col("offset").desc()
    )
    last = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "commit_ts", "offset")
    )
    return last.filter(F.col("op") != "D").drop("op")


def _last_writer_fold(rows: DataFrame) -> DataFrame:
    """Shared consumer apply: last-writer state per (schema, table, key)
    ordered by (commit_ts, offset), live rows only. Every protocol's
    replay ends here — the consumer-side mirror of the MySQL-sink apply
    (cmd/kafka-consumer/writer.go funnels all five decoders into the
    same downstream apply). One keyed fold shuffle."""
    w = Window.partitionBy("schema", "table", "key").orderBy(
        F.col("commit_ts").desc(), F.col("offset").desc()
    )
    last = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "commit_ts", "offset")
    )
    return last.filter(F.col("_op_class") != "D").drop("_op_class")


def replay_debezium_broker_to_state(
    spark: SparkSession,
    broker_dir: str,
    topic: str | None = None,
) -> DataFrame:
    """Debezium consumer replay (cmd/kafka-consumer/writer.go:51-63's
    debezium branch): the envelope's source block carries (db, table,
    commitTs), so table identity AND fold order come from the protocol
    itself — no topic-name side channel, and full-precision commitTs
    avoids the canal ms-truncation caveat. The fold key is the handle
    column of the typed image (the reference consumer reads it from the
    message key envelope; for the bank payload both are `id`). D events
    key by the before-image, everything else by after.

    Output: (schema, table, key, id, balance, note) live rows.
    Scale shape: one from_json map stage, one (schema, table, key) fold
    shuffle; broker scan prunes by topic."""
    from tiflow_spark.codecs.debezium import decode_debezium
    from tiflow_spark.sinks.mq import consume_file_broker

    msgs = consume_file_broker(spark, broker_dir, topic)
    dec = decode_debezium(msgs, extra_cols=("offset",))
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(
        F.col("after")
    )
    rows = dec.select(
        "schema",
        "table",
        img["id"].cast("string").alias("key"),
        F.col("op").alias("_op_class"),
        "commit_ts",
        "offset",
        img["id"].alias("id"),
        img["balance"].alias("balance"),
        img["note"].alias("note"),
    )
    return _last_writer_fold(rows)


def replay_avro_broker_to_state(
    spark: SparkSession,
    broker_dir: str,
    topic: str | None = None,
) -> DataFrame:
    """Confluent-framed Avro consumer replay (writer.go's avro branch):
    the value body carries the typed row + op + full-precision commit_ts;
    table identity is topic-derived ('schema.table' — the reference's
    avro protocol likewise requires table-topic dispatch, so the topic IS
    the table's address). The topic is split on its FIRST '.' only:
    schema names may not contain a dot (MySQL identifiers in the default
    '{schema}.{table}' template don't), while any further dots belong to
    the table name. Fold key is the Avro key-schema column (`id`).

    Output: (schema, table, key, id, balance, note) live rows.
    Scale shape: one Arrow-batched decode stage (binary wire format —
    the one place a pandas_udf is the right tool), one keyed fold
    shuffle; broker scan prunes by topic."""
    from tiflow_spark.codecs.avro import decode_avro
    from tiflow_spark.sinks.mq import consume_file_broker

    msgs = consume_file_broker(spark, broker_dir, topic)
    dec = decode_avro(msgs, extra_cols=("topic", "offset"))
    dot = F.instr(F.col("topic"), ".")
    rows = dec.select(
        F.when(dot > 0, F.substring_index("topic", ".", 1))
        .otherwise(F.lit(""))
        .alias("schema"),
        F.when(
            dot > 0,
            F.expr("substring(topic, instr(topic, '.') + 1)"),
        )
        .otherwise(F.col("topic"))
        .alias("table"),
        F.col("id").cast("string").alias("key"),
        F.col("op").alias("_op_class"),
        "commit_ts",
        "offset",
        "id",
        "balance",
        "note",
    )
    return _last_writer_fold(rows)


def replay_open_broker_to_state(
    spark: SparkSession,
    broker_dir: str,
    payload_types: dict[str, str],
    topic: str | None = None,
) -> DataFrame:
    """Open-protocol consumer replay (cmd/kafka-consumer's open decoder):
    key JSON carries (ts, scm, tbl, type), value carries u/d column-object
    maps whose ``h`` flag marks HANDLE columns — so the fold key comes
    from the protocol itself (no pkNames side channel, unlike canal-json).
    Resolved (t=3) keys are dropped. Last-writer fold on (commit_ts,
    offset); full-precision ts makes the fold total per key without the
    canal ms-truncation caveat.

    Scale shape: one from_json map stage, one (schema, table, key) fold
    shuffle; broker scan prunes by topic."""
    from tiflow_spark.sinks.mq import consume_file_broker

    msgs = consume_file_broker(spark, broker_dir, topic)
    key_schema = "ts BIGINT, scm STRING, tbl STRING, t INT"
    col_obj = "STRUCT<t: INT, h: BOOLEAN, v: STRING>"
    val_schema = f"u MAP<STRING, {col_obj}>, d MAP<STRING, {col_obj}>"
    k = F.from_json(F.col("key"), key_schema)
    v = F.from_json(F.col("value"), val_schema)
    rows = msgs.select(
        "partition",
        "offset",
        k.alias("k"),
        v.alias("m"),
    ).filter(F.col("k.t") == 1)
    img = F.coalesce(F.col("m.u"), F.col("m.d"))
    handle_keys = F.array_sort(
        F.map_keys(F.map_filter(img, lambda _c, o: o["h"]))
    )
    key = F.array_join(
        F.transform(handle_keys, lambda c: F.element_at(img, c)["v"]), "|"
    )
    typed = [
        F.element_at(img, F.lit(name))["v"].cast(t).alias(name)
        for name, t in payload_types.items()
    ]
    flat = rows.select(
        F.col("k.scm").alias("schema"),
        F.col("k.tbl").alias("table"),
        key.alias("key"),
        F.when(F.col("m.d").isNotNull(), "D").otherwise("U").alias(
            "op_class"
        ),
        F.col("k.ts").alias("commit_ts"),
        "offset",
        *typed,
    )
    w = Window.partitionBy("schema", "table", "key").orderBy(
        F.col("commit_ts").desc(), F.col("offset").desc()
    )
    last = (
        flat.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "commit_ts", "offset")
    )
    return last.filter(F.col("op_class") != "D").drop("op_class")


def replay_storage_csv_to_state(
    spark: SparkSession,
    base_dir: str,
    payload_types: dict[str, str],
    cfg=None,
) -> DataFrame:
    """Storage-sink CSV consumer replay (cmd/storage-consumer's csv
    decoder, storage_consumer.go's readFromDownloadedStorage →
    sink-apply loop): the rotated CDC*.csv files under the
    schema/table/version/date layout are read back, decoded by the JVM
    CSV parser, and folded to last-writer live state — the same
    downstream apply every kafka-consumer protocol funnels into.

    CSV carries no intra-ts sequence (reference parity: the csv format's
    columns are op/table/schema/commit-ts + image), so the fold orders
    by commit_ts alone — total only without per-(key, commit_ts) ties,
    which holds whenever the upstream assigns one commit per key-txn
    (the storage-consumer replays whole files in ts order under the same
    assumption). ENFORCED, not assumed: a key whose winning commit_ts
    carries more than one row fails the replay loudly instead of
    silently picking an arbitrary image (same contract discipline as
    replay_broker_to_state's key-sticky assert); the check rides the
    fold's window partitioning — no extra shuffle.

    Output: (schema, table, key, <payload cols>) live rows.
    Scale shape: one distributed text scan with a pushed path glob, one
    from_csv map stage (no Python), one (schema, table, key) fold
    shuffle."""
    from pyspark.sql import types as T

    from tiflow_spark.sinks.storage import (
        StorageSinkConfig,
        read_storage_sink,
    )

    _t = {"bigint": T.LongType(), "double": T.DoubleType(),
          "string": T.StringType()}
    payload = T.StructType(
        [T.StructField(c, _t[t]) for c, t in payload_types.items()]
    )
    dec = read_storage_sink(
        spark, base_dir, payload, cfg or StorageSinkConfig()
    )
    first = next(iter(payload_types))
    rows = dec.select(
        "schema",
        "table",
        F.col(first).cast("string").alias("key"),
        F.col("op").alias("_op_class"),
        "commit_ts",
        *payload_types,
    )
    w = Window.partitionBy("schema", "table", "key").orderBy(
        F.col("commit_ts").desc()
    )
    frame = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    top_rows = F.sum(
        F.when(
            F.col("commit_ts") == F.max("commit_ts").over(frame), 1
        ).otherwise(0)
    ).over(frame)
    # the assert is folded INTO the row-number filter (null-on-success +
    # coalesce true) so column pruning cannot drop it — a free-standing
    # asserted column that is later .drop()ped gets optimized away and
    # the guard silently dies. Window expressions can't sit in a WHERE,
    # so _top materializes first and the filter asserts over the column.
    contract = F.coalesce(
        F.assert_true(
            F.col("_top") <= 1,
            F.concat(
                F.lit("csv replay contract violated: tied commit_ts "
                      "for key "),
                F.col("schema"), F.lit("."), F.col("table"),
                F.lit("/"), F.col("key"),
            ),
        ).cast("boolean"),
        F.lit(True),
    )
    last = (
        rows.withColumn("_top", top_rows)
        .withColumn("_rn", F.row_number().over(w))
        .filter(contract & (F.col("_rn") == 1))
        .drop("_rn", "_top", "commit_ts")
    )
    return last.filter(F.col("_op_class") != "D").drop("_op_class")


def replay_simple_broker_to_state(
    spark: SparkSession,
    broker_dir: str,
    topic: str | None = None,
) -> DataFrame:
    """Simple-protocol consumer replay (cmd/kafka-consumer/writer.go's
    simple branch): the stream interleaves BOOTSTRAP schema frames with
    DML — the reference consumer caches row events until their table's
    bootstrap arrives (writer.go:389-415) and never applies the
    bootstrap itself ("no need to handle it", writer.go:396). In the
    batch replay the decode schema is static, so the cache degenerates:
    bootstrap frames are consumed and DROPPED while DML frames fold —
    the same terminal state the caching consumer reaches. Identity and
    order come from the message body (database/table/commitTs); values
    are the protocol's string-rendered images, re-typed for the fold.

    Output: (schema, table, key, id, balance, note) live rows.
    Scale shape: one from_json map stage, one keyed fold shuffle;
    broker scan prunes by topic."""
    from tiflow_spark.codecs.simple import decode_simple
    from tiflow_spark.sinks.mq import consume_file_broker

    msgs = consume_file_broker(spark, broker_dir, topic)
    dec = decode_simple(msgs, extra_cols=("offset",))
    dml = dec.filter(F.col("op").isNotNull())  # bootstrap frames dropped
    img = F.when(F.col("op") == "D", F.col("old_image")).otherwise(
        F.col("image")
    )
    rows = dml.select(
        "schema",
        "table",
        img["id"].alias("key"),
        F.col("op").alias("_op_class"),
        "commit_ts",
        "offset",
        img["id"].cast("long").alias("id"),
        img["balance"].cast("double").alias("balance"),
        img["note"].alias("note"),
    )
    return _last_writer_fold(rows)
