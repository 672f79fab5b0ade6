"""Local mimic of the driver's duckdb-oracle compare.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet tables,
compares row count, sorted column names, and an order-insensitive value hash.
Used by tests to validate every queries()/oracle_sql() pair before the driver
does.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from tiflow_spark.envelope import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: None if v is None else str(v))
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _dtype_family(dtype) -> str:
    s = str(dtype)
    if "float" in s:
        return "float"
    if "int" in s:  # int64, Int64, uint...
        return "int"
    if "bool" in s:
        return "bool"
    return "other"


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = canonicalize(spark_df.toPandas())
    odf = canonicalize(run_oracle(oracle_sql, sf_dir))
    if len(sdf) != len(odf):
        return False, f"row count: spark={len(sdf)} oracle={len(odf)}"
    if list(sdf.columns) != list(odf.columns):
        return False, f"columns: spark={list(sdf.columns)} oracle={list(odf.columns)}"
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        # the driver hashes values exactly, so a HUGEINT→float64 oracle column
        # vs an int64 spark column can never match even when values agree —
        # fail the dtype family locally to catch that class pre-driver
        if _dtype_family(a.dtype) != _dtype_family(b.dtype):
            return False, (
                f"column {c}: dtype family spark={a.dtype} oracle={b.dtype}"
            )
        try:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False, check_exact=True
            )
        except AssertionError as e:
            return False, f"column {c}: {str(e)[:500]}"
    return True, "ok"
