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

import pandas as pd
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
    env: DataFrame,
    handle_cols: tuple[str, ...] = ("id",),
    output_old_value: bool = False,
    only_output_updated_columns: bool = False,
) -> DataFrame:
    """``output_old_value`` adds the UPDATE pre-image as the ``p`` field
    (open_protocol_message.go:55 ``PreColumns json:"p"``, emitted when
    config.OpenOutputOldValue — the reference defaults it TRUE; our
    default-off form matches output-old-value=false deployments and
    keeps the original byte surface). ``only_output_updated_columns``
    then drops the columns whose pre value equals the post value from
    ``p`` (dropNotUpdatedColumns, open_protocol_message.go:83-99 —
    null-safe native-type compare, declared column order)."""
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

    def pre_map() -> Column:
        entries = F.array(
            *[
                F.struct(
                    F.lit(f.name).alias("key"),
                    _col_obj("before", f, f.name in handle_cols).alias(
                        "value"
                    ),
                    (
                        F.lit(not only_output_updated_columns)
                        | ~F.col(f"before.{f.name}").eqNullSafe(
                            F.col(f"after.{f.name}")
                        )
                    ).alias("keep"),
                )
                for f in fields
            ]
        )
        kept = F.transform(
            F.filter(entries, lambda e: e["keep"]),
            lambda e: F.struct(
                e["key"].alias("key"), e["value"].alias("value")
            ),
        )
        return F.when(
            F.col("before").isNotNull(), F.map_from_entries(kept)
        )

    key = F.to_json(
        F.struct(
            F.col("commit_ts").alias("ts"),
            F.col("schema").alias("scm"),
            F.col("table").alias("tbl"),
            F.lit(1).alias("t"),
        )
    )
    value_fields = [
        F.when(F.col("op") != "D", image("after")).alias("u"),
    ]
    if output_old_value:
        value_fields.append(
            F.when(F.col("op") == "U", pre_map()).alias("p")
        )
    value_fields.append(
        F.when(F.col("op") == "D", image("before")).alias("d")
    )
    value = F.to_json(
        F.struct(*value_fields),
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
    payload_cols: list[tuple[str, str]],
    env_cte: str,
    output_old_value: bool = False,
    only_output_updated_columns: bool = False,
) -> str:
    codes = {"bigint": 3, "int": 3, "double": 5, "string": 15}

    def image(prefix: str) -> str:
        fields = ", ".join(
            f"{n}: {{t: {codes[t]}, h: {str(n == 'id').lower()}, "
            f"v: CAST({prefix}_{n} AS VARCHAR)}}"
            for n, t in payload_cols
        )
        return f"{{{fields}}}"

    if not output_old_value:
        return f"""{env_cte}
    SELECT "schema", "table", commit_ts, seq,
      to_json({{ts: commit_ts, scm: "schema", tbl: "table", t: 1}}) AS key,
      CASE WHEN op = 'D' THEN to_json({{d: {image("before")}}})
           ELSE to_json({{u: {image("after")}}}) END AS value
    FROM env"""

    def pre_map() -> str:
        keep = (
            "before_{n} IS DISTINCT FROM after_{n}"
            if only_output_updated_columns
            else "true"
        )
        entries = ", ".join(
            "{{'k': '{n}', 'v': {{t: {t}, h: {h}, "
            "v: CAST(before_{n} AS VARCHAR)}}, 'keep': {keep}}}".format(
                n=n,
                t=codes[t],
                h=str(n == "id").lower(),
                keep=keep.format(n=n),
            )
            for n, t in payload_cols
        )
        return (
            f"map_from_entries(list_transform(list_filter([{entries}], "
            "x -> x.keep), x -> {'k': x.k, 'v': x.v}))"
        )

    return f"""{env_cte}
    SELECT "schema", "table", commit_ts, seq,
      to_json({{ts: commit_ts, scm: "schema", tbl: "table", t: 1}}) AS key,
      CASE WHEN op = 'D' THEN to_json({{d: {image("before")}}})
           WHEN op = 'U' THEN to_json({{u: {image("after")},
                                        p: {pre_map()}}})
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
    val_schema = (
        f"u MAP<STRING, {col_obj}>, p MAP<STRING, {col_obj}>, "
        f"d MAP<STRING, {col_obj}>"
    )
    k = F.from_json(F.col(key_col), key_schema)
    v = F.from_json(F.col(value_col), val_schema)
    return messages.select(
        k["scm"].alias("schema"),
        k["tbl"].alias("table"),
        k["ts"].alias("commit_ts"),
        F.when(v["d"].isNotNull(), "D").otherwise("U").alias("op_class"),
        F.coalesce(v["u"], v["d"]).alias("image"),
        v["p"].alias("pre_image"),
    )


def _len8(c: Column) -> Column:
    """int64 big-endian length prefix, built JVM-side: hex → lpad(16) → unhex."""
    return F.unhex(F.lpad(F.hex(F.octet_length(c)), 16, "0"))


def frame_batches(
    msgs: DataFrame, max_batch: int = 16
) -> DataFrame:
    """Open-protocol MQ batch framing (open_protocol_encoder.go batch
    layout): one binary frame per ≤``max_batch`` events of a (schema,
    table), commit order preserved:

        [8B version=1][8B key-len][key][8B value-len][value]...

    All binary assembly is built-ins (hex/unhex/concat + an ordered
    aggregate fold) — no Python in the path; one shuffle groups events
    into frames."""
    version8 = F.unhex(F.lpad(F.hex(F.lit(1)), 16, "0"))
    piece = F.concat(
        _len8(F.col("key")),
        F.encode(F.col("key"), "utf-8"),
        _len8(F.col("value")),
        F.encode(F.col("value"), "utf-8"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("schema", "table").orderBy("commit_ts", "seq")
    rows = (
        msgs.withColumn("_rn", F.row_number().over(w))
        .withColumn("batch_no", ((F.col("_rn") - 1) / max_batch).cast("long"))
        .withColumn("_piece", piece)
    )
    return (
        rows.groupBy("schema", "table", "batch_no")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rn"), F.col("_piece")))
                ).getField("_piece"),
                version8,
                lambda acc, x: F.concat(acc, x),
            ).alias("frame"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def unframe_batches(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Frame → (key, value) events (consumer-side, message_decoder parity).
    Python parse (pandas UDF) — decode runs off the hot path."""
    from pyspark.sql.functions import pandas_udf

    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )

    @pandas_udf(out_t)
    def parse(frame: pd.Series) -> pd.Series:
        import struct as _struct

        def one(raw: bytes):
            assert _struct.unpack(">Q", raw[:8])[0] == 1, "bad version"
            i, out = 8, []
            while i < len(raw):
                klen = _struct.unpack(">Q", raw[i : i + 8])[0]
                k = raw[i + 8 : i + 8 + klen].decode()
                i += 8 + klen
                vlen = _struct.unpack(">Q", raw[i : i + 8])[0]
                v = raw[i + 8 : i + 8 + vlen].decode()
                i += 8 + vlen
                out.append({"key": k, "value": v})
            return out

        return frame.map(lambda b: one(bytes(b)))

    return frames.select(
        "schema",
        "table",
        "batch_no",
        F.explode(parse(F.col(frame_col))).alias("kv"),
    ).select("schema", "table", "batch_no", "kv.key", "kv.value")


# DDL kind → numeric job type in open-protocol DDL values; ids mirror the
# public TiDB parser model.ActionType constants for the kinds the
# allow-list carries (unknown kinds encode 0). Both the encoder and its
# oracle derive from THIS table, so the wire ids stay engine-consistent.
DDL_TYPE_IDS = {
    "create database": 1,
    "drop database": 2,
    "create table": 3,
    "drop table": 4,
    "add column": 5,
    "drop column": 6,
    "create index": 7,
    "drop index": 8,
    "add foreign key": 9,
    "drop foreign key": 10,
    "truncate table": 11,
    "modify column": 12,
    "rebase auto id": 13,
    "rename table": 14,
    "set default value": 15,
    "modify table comment": 17,
    "rename index": 18,
    "add table partition": 19,
    "drop table partition": 20,
    "create view": 21,
    "modify table charset and collate": 22,
    "truncate table partition": 23,
    "drop view": 24,
    "recover table": 25,
    "modify schema charset and collate": 26,
    "add primary key": 32,
    "drop primary key": 33,
    "exchange table partition": 42,
    "multi schema change": 61,
}


def encode_open_protocol_ddl(ddl: DataFrame) -> DataFrame:
    """DDL events → Open-Protocol DDL messages (open_protocol_encoder.go
    DDL path): key {ts, scm, tbl, t:2} (type 2 = DDL), value {q: sql,
    t: job type id}."""
    tid = F.lit(0)
    for kind, i in DDL_TYPE_IDS.items():
        tid = F.when(F.col("ddl_type") == kind, F.lit(i)).otherwise(tid)
    key = F.struct(
        F.col("commit_ts").alias("ts"),
        F.col("schema").alias("scm"),
        F.col("table").alias("tbl"),
        F.lit(2).alias("t"),
    )
    value = F.struct(F.col("query").alias("q"), tid.alias("t"))
    return ddl.select(
        "schema",
        "table",
        "commit_ts",
        "seq",
        F.to_json(key).alias("key"),
        F.to_json(value).alias("value"),
    )


def encode_open_protocol_checkpoint(
    resolved: DataFrame,
    ts_col: str = "resolved_ts",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Resolved-ts → Open-Protocol resolved messages (open_protocol_
    encoder.go:242-258 EncodeCheckpointEvent): key = {ts, t: 3}
    (MessageTypeResolved; scm/tbl omitted — omitempty zero values),
    value = EMPTY (the wire frames a zero-length value)."""
    msg = F.struct(
        F.col(ts_col).alias("ts"),
        F.lit(3).alias("t"),
    )
    return resolved.select(
        *extra_cols,
        F.col(ts_col).alias("resolved_ts"),
        F.to_json(msg).alias("key"),
        F.lit("").alias("value"),
    )
