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
    payload_types: dict[str, str],
    topic: str | None = None,
) -> DataFrame:
    """Replay a canal-json topic into the applied table state.

    ``payload_types``: column → Spark type string, used to cast the
    string-valued canal images back to typed columns (the consumer's
    mysqlType-driven decode, column types known from the schema message /
    downstream DDL in the reference).

    Output: (schema, table, key, <typed payload...>) — live rows only.
    """
    from tiflow_spark.sinks.mq import consume_file_broker

    msgs = consume_file_broker(spark, broker_dir, topic)
    m = msgs.select(
        "partition",
        "offset",
        F.from_json("value", _CANAL_SCHEMA).alias("m"),
    ).filter(~F.col("m.isDdl"))
    img = F.element_at(F.col("m.data"), 1)
    key = F.array_join(
        F.transform(F.col("m.pkNames"), lambda pk: F.element_at(img, pk)),
        "|",
    )
    rows = m.select(
        F.col("m.database").alias("schema"),
        F.col("m.table").alias("table"),
        key.alias("key"),
        F.col("m.type").alias("etype"),
        F.col("m.es").alias("es"),
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
    # the same window partitioning — no extra shuffle.
    n_parts = F.size(F.collect_set("partition").over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )))
    last = (
        rows.withColumn(
            "_contract",
            F.assert_true(
                n_parts <= 1,
                F.concat(
                    F.lit("replay contract violated: key observed in "
                          "multiple broker partitions: "),
                    F.col("schema"), F.lit("."), F.col("table"),
                    F.lit("/"), F.col("key"),
                ),
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_contract", "es", "partition", "offset")
    )
    return last.filter(F.col("etype") != "DELETE").drop("etype")
