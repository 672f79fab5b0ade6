"""Portable hashing + sync_diff-style checksums.

The reference validates table equality with a chunked checksum:
``COUNT(*)`` + ``BIT_XOR`` of a per-row 64-bit value derived from
``MD5(CONCAT_WS(',', cols..., ISNULL(col) vector))``
(sync_diff_inspector/utils/utils.go:860-918).  We reproduce the same shape
with Spark built-ins only (md5/conv/bit_xor → whole-stage codegen, no UDFs).

Everything here is *engine-portable*: the identical value is computable in
DuckDB (the correctness oracle) — we use two 15-hex-digit slices of the md5
(60 bits each, always < 2^63) instead of the reference's 16-digit slices so
the value fits a signed BIGINT in every engine without unsigned casts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str) -> Column:
    """64-bit (well, 60-bit) stable hash of a string column.

    Same value as :func:`portable_hash64_sql_duckdb` computes in DuckDB, so
    hash-partitioning / minhash built on it is oracle-checkable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql_duckdb(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`portable_hash64`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def _canon(cols: Sequence[str]) -> Column:
    """Canonical row string: values (nulls → '') + ISNULL bit vector.

    Mirrors the reference's CONCAT_WS + ISNULL trick which disambiguates
    NULL from empty-string (utils.go:860-895). Caller must pre-cast columns
    to strings whose formatting is engine-portable (ints, strings, dates).
    """
    vals = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    nulls = [F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")) for c in cols]
    return F.concat_ws(",", *vals, *nulls)


def row_checksum(cols: Sequence[str]) -> Column:
    """Per-row 60-bit checksum: xor of two md5 slices of the canonical string."""
    m = F.md5(_canon(cols))
    hi = F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint")
    lo = F.conv(F.substring(m, 16, 15), 16, 10).cast("bigint")
    return hi.bitwiseXOR(lo)


def chunk_checksum_agg(cols: Sequence[str]) -> list[Column]:
    """Aggregates for one chunk: COUNT(*) + BIT_XOR(row_checksum).

    Commutative, so partition-local partial aggregation (map-side combine)
    applies — one shuffle of 16 bytes per chunk regardless of chunk size.
    """
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.bit_xor(row_checksum(cols)).alias("checksum"),
    ]


def row_checksum_sql_duckdb(cols: Sequence[str]) -> str:
    """DuckDB SQL computing the same per-row checksum as :func:`row_checksum`."""
    vals = ", ".join(f"coalesce(CAST({c} AS VARCHAR), '')" for c in cols)
    nulls = ", ".join(f"CASE WHEN {c} IS NULL THEN '1' ELSE '0' END" for c in cols)
    canon = f"concat_ws(',', {vals}, {nulls})"
    hi = f"(('0x' || substr(md5({canon}), 1, 15))::BIGINT)"
    lo = f"(('0x' || substr(md5({canon}), 16, 15))::BIGINT)"
    return f"xor({hi}, {lo})"


# --------------------------------------------------------- PositionInertia
#
# tiflow's MQ partition dispatchers (index-value / columns / table) do NOT
# use a portable hash — they use PositionInertia (pkg/hash/
# position_inertia.go:27-56): a running uint32 that starts at 0 and, per
# Write(byte-slices...), XORs in the crc32-IEEE of the concatenated slices.
# The dispatchers call Write(schema, table) once, then Write(colName,
# columnValueString) per key column (cdc/sink/dmlsink/mq/dispatcher/
# partition/index_value.go:45-86, columns.go:44-73, table.go:38-46), and
# place the row at sum32 % partitionNum with the decimal sum32 as the
# message key. Spark's built-in crc32 is the same CRC-32/IEEE, so the
# whole fold stays JVM-side whole-stage codegen: no UDF.


def position_inertia(*writes: Column) -> Column:
    """XOR-fold of crc32 over pre-concatenated write strings.

    Each element of ``writes`` must be a STRING column holding the
    concatenation of the byte-slices of one reference ``Write()`` call
    (the reference concatenates the slices into a single crc32 update,
    so ``Write(a, b)`` == crc32(a || b)). Returns the uint32 sum as a
    non-negative BIGINT — bit-identical to PositionInertia.Sum32().
    """
    acc: Column | None = None
    for w in writes:
        c = F.crc32(w.cast("binary"))
        acc = c if acc is None else acc.bitwiseXOR(c)
    assert acc is not None, "position_inertia needs at least one write"
    return acc


# DuckDB has no crc32 built-in, so the correctness oracle carries its own
# CRC-32/IEEE: the classic 256-entry table generated in SQL (8 conditional
# shift-xor steps per entry, reversed polynomial 0xEDB88320) and a
# list_reduce byte fold. Pure SQL over the same parquet rows — a genuinely
# independent implementation (DuckDB lambda fold vs. the JVM's native
# CRC32), so a hash mismatch cannot be self-consistent error.
CRC32_TABLE_CTE = (
    "crct AS (SELECT list(crc ORDER BY i) AS t FROM ("
    "SELECT i, list_reduce(list_prepend(i::BIGINT, range(8)), "
    "(acc, x) -> CASE WHEN acc % 2 = 1 THEN xor(acc // 2, 3988292384) "
    "ELSE acc // 2 END) AS crc FROM range(256) r(i)))"
)


def crc32_sql_duckdb(expr: str) -> str:
    """DuckDB SQL computing CRC-32/IEEE of an ASCII string expression.

    Requires ``CRC32_TABLE_CTE`` in the query's WITH list and ``crct``
    joined into the FROM clause (it is a 1-row frame, so a comma join is
    free). Byte fold: state=0xFFFFFFFF; per byte b:
    state = (state >> 8) XOR table[(state XOR b) & 0xFF]; final XOR
    0xFFFFFFFF. ASCII-only (ord() is per character, not per byte).
    """
    return (
        f"xor(list_reduce(list_prepend(4294967295::BIGINT, "
        f"list_transform(range(1, length({expr})+1), "
        f"j -> ord(substr({expr}, j::INT, 1)))), "
        f"(acc, b) -> xor(acc // 256, "
        f"crct.t[1 + CAST(xor(acc, b) % 256 AS INT)])), 4294967295)"
    )


def position_inertia_sql_duckdb(*write_exprs: str) -> str:
    """DuckDB SQL for the XOR-fold of crc32 over write expressions."""
    parts = [crc32_sql_duckdb(e) for e in write_exprs]
    out = parts[0]
    for p in parts[1:]:
        out = f"xor({out}, {p})"
    return out
