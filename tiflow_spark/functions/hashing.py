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
