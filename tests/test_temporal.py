"""Semantics tests for the generic temporal joins (operators/temporal.py).
Exact parity vs DuckDB (native ASOF JOIN / inequality join) is covered by
test_parity.py; these pin the tricky edges: strict vs inclusive tie
handling, left-outer nulls, window boundary inclusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiflow_spark.operators.temporal import asof_join, range_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 200), (3, "b", 50)],
        "id INT, k STRING, ts LONG",
    )
    right = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 150, 2.0), ("b", 60, 9.0)],
        "k STRING, ts LONG, v DOUBLE",
    )
    return left, right


def test_asof_inclusive_picks_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["ts", "v"]
        ).collect()
    }
    assert out[1] == (100, 1.0)  # equal ts visible when inclusive
    assert out[2] == (150, 2.0)  # latest earlier reading
    assert out[3] == (None, None)  # nothing at-or-before 50 → left outer


def test_asof_strict_hides_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["ts", "v"], strict=True
        ).collect()
    }
    assert out[1] == (None, None)  # ts=100 reading hidden under strict <
    assert out[2] == (150, 2.0)


def test_range_join_window_boundaries(spark):
    left = spark.createDataFrame([(1, "a", 1000)], "id INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("a", 900, "in"), ("a", 1100, "in_hi"), ("a", 1101, "out"),
         ("a", 899, "out_lo"), ("b", 1000, "other_key")],
        "k STRING, ts LONG, tag STRING",
    )
    out = sorted(
        r["r_tag"]
        for r in range_join(left, right, ["k"], "ts", "ts", 100).collect()
    )
    assert out == ["in", "in_hi"]  # |Δ| ≤ 100 inclusive, key-scoped


def test_range_join_pairs_meet_exactly_once(spark):
    # bucket-adjacent pairs must not be double-counted by the 3-way explode
    left = spark.createDataFrame(
        [(i, "u", i * 10) for i in range(40)], "id INT, k STRING, ts LONG"
    )
    out = range_join(left, left.selectExpr("k", "ts", "id AS rid"),
                     ["k"], "ts", "ts", 35)
    n = out.count()
    # oracle: brute force count
    rows = [(i, i * 10) for i in range(40)]
    want = sum(
        1 for a, ta in rows for b, tb in rows if abs(ta - tb) <= 35
    )
    assert n == want
