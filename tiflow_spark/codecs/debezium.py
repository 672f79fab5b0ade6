"""Debezium-compatible JSON envelope codec.

Reference: pkg/sink/codec/debezium/codec.go (1683 LoC). We reproduce the
payload shape (`before`, `after`, `source`, `op`, `ts_ms`) with the TiDB
source fields the reference emits (connector/version/db/table/commitTs).
Schemas block omitted (the reference gates it behind a config too).

op mapping: I → "c" (create), U → "u", D → "d"; ts_ms pinned to 0 for
determinism (reference stamps wall clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_debezium(env: DataFrame, connector_version: str = "2.4.0.Final") -> DataFrame:
    op = (
        F.when(F.col("op") == "I", "c")
        .when(F.col("op") == "U", "u")
        .otherwise("d")
    )
    source = F.struct(
        F.lit("TiCDC").alias("connector"),
        F.lit(connector_version).alias("version"),
        F.col("schema").alias("db"),
        F.col("table").alias("table"),
        F.col("commit_ts").alias("commitTs"),
        F.expr("commit_ts div 1000").alias("ts_ms"),
    )
    payload = F.struct(
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        source.alias("source"),
        op.alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    return env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        F.to_json(F.struct(payload.alias("payload")), {"ignoreNullFields": "false"}).alias(
            "value"
        ),
    )


def debezium_sql_duckdb(payload_cols: list[tuple[str, str]], env_cte: str) -> str:
    def img(prefix: str) -> str:
        fields = ", ".join(f"{n}: {prefix}_{n}" for n, _ in payload_cols)
        return f"CASE WHEN {prefix}_id IS NOT NULL THEN {{{fields}}} END"

    return f"""{env_cte}
    SELECT "schema", "table", commit_ts, seq, to_json({{payload: {{
      before: {img("before")},
      after: {img("after")},
      source: {{connector: 'TiCDC', version: '2.4.0.Final', db: "schema",
                "table": "table", commitTs: commit_ts, ts_ms: commit_ts // 1000}},
      op: CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END,
      ts_ms: 0::BIGINT
    }}}}) AS value FROM env"""

def decode_debezium(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Debezium envelope JSON → change rows (debezium consumer parity)."""
    img = "STRUCT<id: BIGINT, balance: DOUBLE, note: STRING>"
    schema = (
        f"payload STRUCT<before: {img}, after: {img}, "
        "source STRUCT<connector: STRING, version: STRING, db: STRING, "
        "table: STRING, commitTs: BIGINT, ts_ms: BIGINT>, "
        "op: STRING, ts_ms: BIGINT>"
    )
    m = messages.select(F.from_json(F.col(value_col), schema).alias("m"))
    op = (
        F.when(F.col("m.payload.op") == "c", "I")
        .when(F.col("m.payload.op") == "u", "U")
        .otherwise("D")
    )
    return m.select(
        op.alias("op"),
        F.col("m.payload.source.db").alias("schema"),
        F.col("m.payload.source.table").alias("table"),
        F.col("m.payload.source.commitTs").alias("commit_ts"),
        F.col("m.payload.before").alias("before"),
        F.col("m.payload.after").alias("after"),
    )
