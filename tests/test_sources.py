"""Chunked-source predicate generation (sync_diff chunk.Range parity)."""

import duckdb

from tiflow_spark.sources.jdbc_source import ChunkSpec, chunk_predicates


def test_chunk_predicates_cover_domain_exactly_once():
    preds = chunk_predicates(ChunkSpec("c_custkey", [100, 200, 300]))
    assert len(preds) == 4
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM "
        "(VALUES (NULL), (1), (99), (100), (199), (200), (299), (300), (9999))"
        " v(c_custkey)"
    )
    hits = " + ".join(f"CASE WHEN {p} THEN 1 ELSE 0 END" for p in preds)
    lo, hi = con.execute(
        f"SELECT min({hits}), max({hits}) FROM t"
    ).fetchone()
    assert (lo, hi) == (1, 1)  # every row in exactly one chunk


def test_single_chunk_when_no_bounds():
    assert chunk_predicates(ChunkSpec("x", [])) == ["1 = 1"]
