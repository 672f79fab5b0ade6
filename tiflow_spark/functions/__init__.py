from tiflow_spark.functions.hashing import (  # noqa: F401
    portable_hash64,
    portable_hash64_sql_duckdb,
    row_checksum,
    chunk_checksum_agg,
)
