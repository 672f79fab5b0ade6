"""MySQL/TiDB type fidelity — SURVEY.md §1.2's matrix as Spark columns.

The reference surfaces MySQL types when the mounter formats datums
(cdc/entry/mounter.go:772-841 formatColVal):

- Date/Datetime/Timestamp → string (no TZ conversion) ... TimestampNTZ/string
- Duration, JSON, NewDecimal → string (decimal keeps string to preserve
  precision beyond float)
- Enum/Set → uint64 numeric value; name mapping kept in schema
- Bit → uint64 (mounter.go:804-808, avoids pingcap/tidb#10988)
- String/Blob family → bytes; BinaryFlag decides binary vs text
  (cdc/model/sink.go:98 IsBinary)
- Float/Double → NaN/±Inf coerced to 0 with a warning (mounter.go:816-831)
- unsigned BIGINT → values above MaxInt64 need DECIMAL(20,0)
  (flag: sink.go:193-205 UnsignedFlag)

Spark-first shape: each rule is a pure Column→Column function (codegen'd,
no UDFs); the schema carries the MySQL identity in StructField.metadata so
codecs can render mysqlType faithfully.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UNSIGNED_WRAP = 18446744073709551616  # 2^64: two's-complement → unsigned

# mysql type name → (spark type, is_string_repr)
MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "date": T.StringType(),  # reference keeps formatted string, sink applies tz
    "datetime": T.StringType(),
    "timestamp": T.StringType(),
    "time": T.StringType(),  # Duration — no Spark day-time fidelity, keep string
    "json": T.StringType(),
    "decimal": T.StringType(),  # string round-trip preserves >float precision
    "enum": T.LongType(),
    "set": T.LongType(),
    "bit": T.LongType(),
    "tinyint": T.LongType(),
    "smallint": T.LongType(),
    "int": T.LongType(),
    "bigint": T.LongType(),
    "bigint unsigned": T.DecimalType(20, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "text": T.StringType(),
    "blob": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "binary": T.BinaryType(),
    "vector": T.ArrayType(T.FloatType()),  # TiDBVectorFloat32 (mounter.go:832)
    "mediumint": T.LongType(),
    "year": T.LongType(),
    "tinytext": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "tinyblob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
}

# display widths the DDL assigns when the column omits one:
# (signed, unsigned) — pinned by the reference's full-type table
# (pkg/sink/codec/canal/type_test.go: int(11)/int(10) unsigned, ...)
_DEFAULT_INT_FLEN = {
    "tinyint": (4, 3),
    "smallint": (6, 5),
    "mediumint": (9, 8),
    "int": (11, 10),
    "bigint": (20, 20),
}


def mysql_full_type(meta: dict) -> str:
    """The FULL MySQL type descriptor for a column's metadata dict — the
    reference's GetMySQLType(col, fullType=true) → ColumnInfo.GetTypeDesc()
    path (pkg/sink/codec/utils/mysql_types.go:25-33; TiDB FieldType
    CompactStr semantics), pinned against the full-type expectation table
    in pkg/sink/codec/canal/type_test.go: ``int(11)``,
    ``bigint(20) unsigned zerofill``, ``decimal(10,2)``,
    ``enum('a','b','c')``, ``datetime(3)``, bare ``double`` unless an
    explicit (M,D), bare text/blob names. Used by canal-json
    ``content-compatible`` mode (common/config.go:270-275)."""
    t = meta.get("mysqlType")
    if t is None:
        raise ValueError("full mysql type needs 'mysqlType' metadata")
    unsigned = bool(meta.get("unsigned"))
    zerofill = bool(meta.get("zerofill"))
    flen = meta.get("flen")
    dec = meta.get("decimal")
    if t in ("char", "varchar") and meta.get("binary"):
        # binary charset renders the binary name (TypeToStr, type_test.go
        # binary(1) / varbinary(23) rows)
        t = {"char": "binary", "varchar": "varbinary"}[t]
    if t in ("enum", "set"):
        vals = ",".join(f"'{v}'" for v in meta.get("values", ()))
        desc = f"{t}({vals})"
    elif t in _DEFAULT_INT_FLEN:
        if flen is None:
            flen = _DEFAULT_INT_FLEN[t][1 if unsigned else 0]
        desc = f"{t}({flen})"
    elif t == "bit":
        desc = f"bit({flen if flen is not None else 1})"
    elif t == "year":
        desc = f"year({flen if flen is not None else 4})"
    elif t == "decimal":
        desc = (
            f"decimal({flen if flen is not None else 10},"
            f"{dec if dec is not None else 0})"
        )
    elif t in ("float", "double"):
        # suffix only with an explicit (M,D) — CompactStr hides defaults
        desc = f"{t}({flen},{dec})" if dec is not None else t
    elif t in ("char", "binary"):
        desc = f"{t}({flen if flen is not None else 1})"
    elif t in ("varchar", "varbinary"):
        if flen is None:
            raise ValueError(f"{t} needs 'flen' metadata for its full type")
        desc = f"{t}({flen})"
    elif t in ("datetime", "timestamp", "time"):
        desc = f"{t}({dec})" if dec else t
    else:  # text/blob families, date, json, vector
        desc = t
    if unsigned and t not in ("bit", "year"):
        desc += " unsigned"
    if zerofill and t != "year":
        desc += " zerofill"
    return desc


@dataclass(frozen=True)
class ColumnSpec:
    """One column of a replicated table: MySQL identity + flags.

    Mirrors Column/ColumnFlagType (cdc/model/sink.go:667-690, :62-205);
    flags land in StructField.metadata for codecs/selectors to read.
    """

    name: str
    mysql_type: str
    unsigned: bool = False
    binary: bool = False  # BinaryFlag (sink.go:98)
    primary_key: bool = False
    enum_values: tuple[str, ...] = ()  # enum/set name tables
    default: str | None = None
    # display width / decimals / zerofill — the FieldType identity the
    # full-type descriptor needs (mysql_full_type); None → DDL default
    flen: int | None = None
    decimal_digits: int | None = None
    zerofill: bool = False

    def spark_type(self) -> T.DataType:
        if self.mysql_type == "bigint" and self.unsigned:
            return T.DecimalType(20, 0)
        if self.mysql_type in ("varchar", "char", "text") and self.binary:
            return T.BinaryType()
        return MYSQL_TO_SPARK[self.mysql_type]

    def spark_field(self) -> T.StructField:
        meta = {"mysqlType": self.mysql_type}
        if self.unsigned:
            meta["unsigned"] = True
        if self.binary:
            meta["binary"] = True
        if self.primary_key:
            meta["pk"] = True
        if self.enum_values:
            meta["values"] = list(self.enum_values)
        if self.default is not None:
            meta["default"] = self.default
        if self.flen is not None:
            meta["flen"] = self.flen
        if self.decimal_digits is not None:
            meta["decimal"] = self.decimal_digits
        if self.zerofill:
            meta["zerofill"] = True
        return T.StructField(self.name, self.spark_type(), True, meta)

    def full_type(self) -> str:
        """Full descriptor (``int(11) unsigned`` style) — see
        :func:`mysql_full_type`."""
        return mysql_full_type(self.spark_field().metadata)


def table_schema(specs: list[ColumnSpec]) -> T.StructType:
    return T.StructType([s.spark_field() for s in specs])


# ---------------------------------------------------------------- coercions


def coerce_invalid_float(col: Column) -> Column:
    """NaN/±Inf → 0, the mounter's invalid-float rule (mounter.go:816-831)."""
    return F.when(
        F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit(0.0)
    ).otherwise(col)


def unsigned_bigint(col: Column) -> Column:
    """Decode an int64-carried unsigned BIGINT: negative two's-complement
    values are > MaxInt64 and must widen to DECIMAL(20,0) (sink.go:193-205;
    SURVEY §1.2). Non-negative values stay exact in the same decimal."""
    dec = col.cast(T.DecimalType(20, 0))
    wrap = F.expr(f"CAST('{_UNSIGNED_WRAP}' AS DECIMAL(20,0))")
    return F.when(col < 0, (dec + wrap).cast(T.DecimalType(20, 0))).otherwise(dec)


def enum_name(col: Column, values: tuple[str, ...]) -> Column:
    """Enum numeric value (1-based, mounter.go:796) → display name."""
    return F.element_at(F.array(*[F.lit(v) for v in values]), col.cast("int"))


def set_names(col: Column, values: tuple[str, ...]) -> Column:
    """Set bitmask (mounter.go:800) → comma-joined member names, MySQL
    display order. Pure built-ins: filter a literal array by bit test."""
    idx = F.array(*[F.struct(F.lit(1 << i).alias("m"), F.lit(v).alias("v"))
                    for i, v in enumerate(values)])
    members = F.filter(idx, lambda e: col.bitwiseAND(e["m"]) == e["m"])
    return F.array_join(F.transform(members, lambda e: e["v"]), ",")


def bit_to_long(col: Column) -> Column:
    """BIT(n) → integer (mounter.go:804-808 encodes bits as ints)."""
    return col.cast("long")


def decimal_fits(col: Column, precision: int = 38) -> Column:
    """True when a decimal *string* fits Spark's DecimalType(38) — beyond
    that the engine keeps the string (reference keeps string always;
    NewDecimal mounter.go:788-795)."""
    digits = F.length(F.regexp_replace(col, r"[-.]", ""))
    return digits <= F.lit(precision)


def text_or_binary(col: Column, binary_flag: bool) -> Column:
    """BinaryFlag routing (sink.go:98): binary charset → BinaryType bytes,
    else text. Encoders then render base64/hex vs plain string."""
    return col.cast("binary") if binary_flag else col.cast("string")


def parse_vector(col: Column) -> Column:
    """TiDBVectorFloat32 literal ``[1.0,2.0,...]`` → ``array<float>``
    (mounter.go:832-834 formats the datum via its String() form; codecs
    deliver it as that literal). Pure built-ins — codegen'd parse."""
    return F.transform(
        F.split(F.regexp_replace(col, r"[\[\]]", ""), ","),
        lambda x: x.cast("float"),
    )


def encode_vector(arr: Column) -> Column:
    """``array<float>`` → TiDB vector literal (the sink-side inverse)."""
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ","),
        F.lit("]"),
    )


def decode_charset(col: Column, charset: str) -> Column:
    """Non-UTF8 column charset → UTF-8 string (JVM-side, codegen'd).

    The reference decodes upstream column bytes against the column's MySQL
    charset before encoding events (mounter charset handling; e2e
    tests/integration_tests/charset_gbk/). Spark's built-in ``decode``
    supports the same java.nio charsets (GBK, BIG5, latin1, ...) once
    ``spark.sql.legacy.javaCharsets`` is on (Spark 4 restricts the default
    set to unicode/latin1), so the conversion is a pure expression — no
    Python, no UDF. The flag is set here so callers need no session setup.
    """
    _enable_java_charsets()
    return F.decode(col, charset)


def _enable_java_charsets() -> None:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")


def encode_charset(col: Column, charset: str) -> Column:
    """UTF-8 string → target-charset bytes (inverse path, for sinks that
    must ship the upstream charset verbatim)."""
    _enable_java_charsets()
    return F.encode(col, charset)


# -------------------------------------------------- wire-type string parse


def extract_basic_mysql_type(full: str) -> str:
    """The base type name from a (possibly full) mysqlType wire string —
    utils.ExtractBasicMySQLType (pkg/sink/codec/utils/mysql_types.go:
    36-44): cut at the first '(' or ' ', so the canal-json decoder
    tolerates content-compatible FULL descriptors ('int(11) unsigned
    zerofill' → 'int') and plain names alike."""
    for i, ch in enumerate(full):
        if ch in "( ":
            return full[:i]
    return full


def is_binary_mysql_type(full: str) -> bool:
    """utils.IsBinaryMySQLType (mysql_types.go:47-49): substring test on
    the FULL wire string — 'varbinary(16)' and 'mediumblob' both hit."""
    return "blob" in full or "binary" in full


def spark_cast_for_mysql_type(full: str) -> str:
    """Spark cast target for one mysqlType wire string — the decode side
    of schema-from-wire replay (the reference consumer derives column
    types from the message's mysqlType map, canal_json_message.go:
    332-353 + canalJSONFormatColumn :355-421)."""
    low = full.lower()
    if is_binary_mysql_type(low):
        return "binary"
    base = extract_basic_mysql_type(low)
    if base == "bigint" and "unsigned" in low:
        return "decimal(20,0)"  # sink.go:193-205 widening
    t = MYSQL_TO_SPARK.get(base)
    return t.simpleString() if t is not None else "string"
