"""Open Protocol codec — TiCDC's own key/value JSON format.

Reference: pkg/sink/codec/open/open_protocol_encoder.go (371 LoC) +
open_protocol_message.go. Per event:
  key:   {"ts": commit_ts, "scm": schema, "tbl": table, "t": 1}
  value: {"u": {col: {"t": type, "h": is-handle, "v": value}}}   (upsert)
         {"d": {col: {...}}}                                     (delete)
Type codes follow the MySQL wire types the reference uses (long=3,
double=5, varchar=15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_CODES = {
    T.LongType(): 3,
    T.IntegerType(): 3,
    T.DoubleType(): 5,
    T.StringType(): 15,
}


def _col_obj(side: str, f: T.StructField, handle: bool) -> Column:
    return F.struct(
        F.lit(_TYPE_CODES[f.dataType]).alias("t"),
        F.lit(handle).alias("h"),
        F.col(f"{side}.{f.name}").cast("string").alias("v"),
    )


def encode_open_protocol(
    env: DataFrame, handle_cols: tuple[str, ...] = ("id",)
) -> DataFrame:
    fields = list(env.schema["after"].dataType.fields)  # type: ignore[union-attr]

    def image(side: str) -> Column:
        return F.when(
            F.col(side).isNotNull(),
            F.struct(
                *[
                    _col_obj(side, f, f.name in handle_cols).alias(f.name)
                    for f in fields
                ]
            ),
        )

    key = F.to_json(
        F.struct(
            F.col("commit_ts").alias("ts"),
            F.col("schema").alias("scm"),
            F.col("table").alias("tbl"),
            F.lit(1).alias("t"),
        )
    )
    value = F.to_json(
        F.struct(
            F.when(F.col("op") != "D", image("after")).alias("u"),
            F.when(F.col("op") == "D", image("before")).alias("d"),
        ),
        {"ignoreNullFields": "true"},
    )
    return env.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        key.alias("key"),
        value.alias("value"),
    )


def open_protocol_sql_duckdb(
    payload_cols: list[tuple[str, str]], env_cte: str
) -> str:
    codes = {"bigint": 3, "int": 3, "double": 5, "string": 15}

    def image(prefix: str) -> str:
        fields = ", ".join(
            f"{n}: {{t: {codes[t]}, h: {str(n == 'id').lower()}, "
            f"v: CAST({prefix}_{n} AS VARCHAR)}}"
            for n, t in payload_cols
        )
        return f"{{{fields}}}"

    return f"""{env_cte}
    SELECT "schema", "table", commit_ts, seq,
      to_json({{ts: commit_ts, scm: "schema", tbl: "table", t: 1}}) AS key,
      CASE WHEN op = 'D' THEN to_json({{d: {image("before")}}})
           ELSE to_json({{u: {image("after")}}}) END AS value
    FROM env"""


def decode_open_protocol(
    messages: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Open-protocol key/value JSON → change rows (open_protocol_decoder.go /
    cmd/kafka-consumer parity). Column objects come back as
    map<col, struct{t,h,v}> so any payload schema decodes."""
    key_schema = "ts BIGINT, scm STRING, tbl STRING, t INT"
    col_obj = "STRUCT<t: INT, h: BOOLEAN, v: STRING>"
    val_schema = f"u MAP<STRING, {col_obj}>, d MAP<STRING, {col_obj}>"
    k = F.from_json(F.col(key_col), key_schema)
    v = F.from_json(F.col(value_col), val_schema)
    return messages.select(
        k["scm"].alias("schema"),
        k["tbl"].alias("table"),
        k["ts"].alias("commit_ts"),
        F.when(v["d"].isNotNull(), "D").otherwise("U").alias("op_class"),
        F.coalesce(v["u"], v["d"]).alias("image"),
    )
