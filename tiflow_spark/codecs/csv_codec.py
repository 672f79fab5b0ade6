"""CSV codec — encode/decode the change envelope as CSV lines.

Reference: pkg/sink/codec/csv/csv_message.go (layout :99-110, quoting
:197-245, op taxonomy I/U/D :99) and csv_encoder.go. Message layout:

    op, table, schema [, commit_ts] [, is_update] [, handle_key] , col1..colN

- quote mode: string fields wrapped in the quote char, inner quotes doubled
  (RFC 4180); numbers unquoted; NULL → null_string (default ``\\N``).
- handle-key meta column (csv_message.go:139-141 OutputHandleKey) and
  base64/hex text encoding for binary payload columns
  (csv_message.go:286-293,331-343 BinaryEncodingMethod) — both JVM
  built-ins (base64/hex/unbase64/unhex).
- escape mode (empty quote): backslash-escape \\, \\r → \\r, \\n → \\n and
  the delimiter.
- update events with ``output_old_value``: encoded as TWO rows — D(pre) then
  I(post) (csv_message.go:105-113) with the is-update flag set.

Everything is built-in string expressions → whole-stage codegen; at 100 TB
the encode is a pure map stage with no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class CsvConfig:
    delimiter: str = ","
    quote: str = '"'  # empty string → escape mode
    null_string: str = "\\N"
    include_commit_ts: bool = True
    output_old_value: bool = False
    # extra meta column carrying the handle key after is-updated
    # (csv_message.go:139-141, OutputHandleKey)
    output_handle_key: bool = False
    # binary columns ride as text: 'base64' | 'hex'
    # (csv_message.go:331-343, config.BinaryEncodingMethod)
    binary_encoding_method: str = "base64"
    # emit the ticdc-meta$* + column-name header as the first line of
    # each data file; the decoder validates and skips it
    # (csv_encoder.go:40 setHeader, csv_message.go:495 encodeHeader,
    # csv_decoder.go:63-80; config.go:93,239 csv.output-field-header)
    output_field_header: bool = False


def csv_header_line(payload_names: list[str], cfg: CsvConfig) -> str:
    """The header line encodeHeader (csv_message.go:494-520) writes:
    ``ticdc-meta$operation, ticdc-meta$table, ticdc-meta$schema``, then
    ``ticdc-meta$commit-ts`` iff IncludeCommitTs and
    ``ticdc-meta$is-update`` iff OutputOldValue, then the column names —
    raw (never quoted), delimiter-joined. The reference writes NO header
    entry for the OutputHandleKey meta column (encodeHeader has no
    branch for it) — mirrored."""
    names = ["ticdc-meta$operation", "ticdc-meta$table", "ticdc-meta$schema"]
    if cfg.include_commit_ts:
        names.append("ticdc-meta$commit-ts")
    if cfg.output_old_value:
        names.append("ticdc-meta$is-update")
    return cfg.delimiter.join([*names, *payload_names])


def with_csv_headers(
    lines: DataFrame,
    payload_names: list[str],
    cfg: CsvConfig,
    group_cols: tuple[str, ...] = ("table", "schema"),
) -> DataFrame:
    """Union one header row per distinct ``group_cols`` group into an
    :func:`encode_csv` line stream (header carries commit_ts = seq = -1
    so any (commit_ts, seq) sort places it first in its file — the
    file-writer contract csv_encoder.go:40 keeps by emitting the header
    before the first appended row). The distinct is metadata-scale (one
    row per table/date group)."""
    header = csv_header_line(payload_names, cfg)
    extra = (
        [F.lit(-1).cast("int").alias("pos")]
        if "pos" in lines.columns
        else []
    )
    hdr = lines.select(*group_cols).distinct().select(
        *group_cols,
        F.lit(-1).cast("long").alias("commit_ts"),
        F.lit(-1).cast("long").alias("seq"),
        *extra,
        F.lit(header).alias("line"),
    )
    return lines.unionByName(hdr)


def _fmt_string(c: Column, cfg: CsvConfig) -> Column:
    if cfg.quote:
        q = cfg.quote
        return F.concat(F.lit(q), F.replace(c, F.lit(q), F.lit(q + q)), F.lit(q))
    # escape mode: \ first, then CR/LF/delimiter
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit(cfg.delimiter), F.lit("\\" + cfg.delimiter))
    return out


def _bin_encode(c: Column, cfg: CsvConfig) -> Column:
    if cfg.binary_encoding_method == "base64":
        return F.base64(c)
    if cfg.binary_encoding_method == "hex":
        return F.lower(F.hex(c))
    raise ValueError(
        f"unsupported binary encoding method {cfg.binary_encoding_method}"
    )


def _bin_decode(c: Column, cfg: CsvConfig) -> Column:
    if cfg.binary_encoding_method == "base64":
        return F.unbase64(c)
    if cfg.binary_encoding_method == "hex":
        return F.unhex(c)
    raise ValueError(
        f"unsupported binary encoding method {cfg.binary_encoding_method}"
    )


def _fmt(c: Column, dtype: T.DataType, cfg: CsvConfig) -> Column:
    if isinstance(dtype, T.StringType):
        formatted = _fmt_string(c, cfg)
    elif isinstance(dtype, T.BinaryType):
        formatted = _fmt_string(_bin_encode(c, cfg), cfg)
    elif isinstance(dtype, T.BooleanType):
        formatted = F.when(c, "true").otherwise("false")
    else:
        formatted = c.cast("string")
    return F.coalesce(formatted, F.lit(cfg.null_string))


def encode_csv(env: DataFrame, cfg: CsvConfig = CsvConfig()) -> DataFrame:
    """Envelope → DataFrame[table, schema, commit_ts, line STRING].

    One output row per CSV line (U may produce two in old-value mode).
    """
    side_t = env.schema["after"].dataType

    def row_line(op: Column, image: str) -> Column:
        fields = [
            _fmt(op, T.StringType(), cfg),
            _fmt(F.col("table"), T.StringType(), cfg),
            _fmt(F.col("schema"), T.StringType(), cfg),
        ]
        if cfg.include_commit_ts:
            fields.append(_fmt(F.col("commit_ts"), T.LongType(), cfg))
        if cfg.output_old_value:
            fields.append(
                _fmt(F.col("op") == "U", T.BooleanType(), cfg)
            )
        if cfg.output_handle_key:
            fields.append(_fmt(F.col("key"), T.StringType(), cfg))
        for f in side_t.fields:  # type: ignore[union-attr]
            fields.append(_fmt(F.col(f"{image}.{f.name}"), f.dataType, cfg))
        return F.concat_ws(cfg.delimiter, *fields)

    if cfg.output_old_value:
        lines = (
            F.when(
                F.col("op") == "U",
                F.array(row_line(F.lit("D"), "before"), row_line(F.lit("I"), "after")),
            )
            .when(F.col("op") == "D", F.array(row_line(F.lit("D"), "before")))
            .otherwise(F.array(row_line(F.lit("I"), "after")))
        )
    else:
        image_line = F.when(
            F.col("op") == "D", row_line(F.col("op"), "before")
        ).otherwise(row_line(F.col("op"), "after"))
        lines = F.array(image_line)
    if cfg.output_old_value:
        # The D and I halves of one update share (commit_ts, seq), and
        # Spark's sort is NOT stable — without a tiebreaker the storage
        # sink's file sort could write I before D, inverting the
        # reference's old-row-first contract (csv_message.go:107-116
        # encodes the pre-image row, THEN the post-image row). The array
        # position rides along as `pos` (0 = D, 1 = I) and the file sort
        # appends it to the key.
        return env.select(
            "table",
            "schema",
            "commit_ts",
            "seq",
            F.posexplode(lines).alias("pos", "line"),
        )
    return env.select(
        "table",
        "schema",
        "commit_ts",
        "seq",
        F.explode(lines).alias("line"),
    )


def decode_csv(
    lines: DataFrame,
    payload_schema: T.StructType,
    cfg: CsvConfig = CsvConfig(),
    line_col: str = "line",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """CSV lines → parsed change rows (round-trip of :func:`encode_csv`).

    Built on from_csv (JVM parser) — decode is a map stage, no Python.
    """
    meta = [
        T.StructField("op", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("schema", T.StringType()),
    ]
    if cfg.include_commit_ts:
        meta.append(T.StructField("commit_ts", T.LongType()))
    if cfg.output_old_value:
        meta.append(T.StructField("is_update", T.BooleanType()))
    if cfg.output_handle_key:
        meta.append(T.StructField("handle_key", T.StringType()))
    # binary payload columns ride the wire as base64/hex TEXT
    # (csv_message.go:286-293): parse them as strings, decode after
    bin_fields = {
        f.name for f in payload_schema.fields
        if isinstance(f.dataType, T.BinaryType)
    }
    wire_payload = [
        T.StructField(f.name, T.StringType())
        if f.name in bin_fields
        else f
        for f in payload_schema.fields
    ]
    full = T.StructType(meta + wire_payload)
    opts = {
        "sep": cfg.delimiter,
        "quote": cfg.quote or "",
        "escape": cfg.quote or "\\",
        "nullValue": cfg.null_string,
    }
    if cfg.output_field_header:
        # csv_decoder.go:63-80: ReadColumns consumes the header and
        # PANICS on a column-name mismatch against the table schema —
        # here: any header-shaped line must equal the expected header
        # byte-for-byte (assert folded into the filter so pruning can't
        # drop it), then header lines leave the stream before parsing
        expected = csv_header_line(
            [f.name for f in payload_schema.fields], cfg
        )
        is_header = F.col(line_col).startswith("ticdc-meta$operation")
        # ADVICE r12: the previous form (assert & ~is_header) was a
        # CONJUNCTION — Catalyst may split conjuncts and apply ~is_header
        # first, silently dropping a mismatched header before the assert
        # evaluates. A single CASE is not splittable: non-header rows
        # take the TRUE branch untouched; every header row must pass
        # through the assert (mismatch → error, match → null → dropped
        # via coalesce(false)). Negative-tested in tests/test_round13.py.
        keep = F.when(~is_header, F.lit(True)).otherwise(
            F.coalesce(
                F.assert_true(
                    F.col(line_col) == F.lit(expected),
                    F.concat(
                        F.lit("csv decoder: header mismatch: "),
                        F.col(line_col),
                    ),
                ).cast("boolean"),
                F.lit(False),
            )
        )
        lines = lines.filter(keep)
    parsed = lines.select(
        *keep_cols,
        F.from_csv(F.col(line_col), full.simpleString(), opts).alias("r"),
    )
    out = parsed.select(*keep_cols, "r.*")
    for name in bin_fields:
        out = out.withColumn(name, _bin_decode(F.col(name), cfg))
    return out


def csv_encode_sql_duckdb(
    payload_cols: list[tuple[str, str]],
    env_cte: str,
    cfg: CsvConfig = CsvConfig(),
) -> str:
    """DuckDB SQL producing identical lines from the flattened envelope CTE.

    payload_cols: [(flattened_col_base, sqltype)] e.g. [("id","bigint"), ...];
    the before_/after_ prefix is applied per op like encode_csv does.
    """
    assert cfg.quote and not cfg.output_old_value, "oracle covers quote mode"
    q = cfg.quote

    def fmt_str(e: str) -> str:
        return f"'{q}' || replace({e}, '{q}', '{q}{q}') || '{q}'"

    def fmt(e: str, typ: str) -> str:
        inner = fmt_str(e) if typ == "string" else f"CAST({e} AS VARCHAR)"
        return f"coalesce({inner}, '\\N')"

    parts = [fmt("op", "string"), fmt('"table"', "string"), fmt('"schema"', "string")]
    if cfg.include_commit_ts:
        parts.append(fmt("commit_ts", "long"))
    for base, typ in payload_cols:
        img = f"CASE WHEN op = 'D' THEN before_{base} ELSE after_{base} END"
        parts.append(fmt(img, typ))
    line = " || ',' || ".join(parts)
    return f"""{env_cte}
    SELECT "table", "schema", commit_ts, seq, {line} AS line FROM env"""
