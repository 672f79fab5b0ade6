"""Scheduler move-planning invariants (round 6 late).

Oracle equality is covered by the registry sweep; these pin the
reference's balance semantics (scheduler_rebalance.go /
scheduler_drain_capture.go) that hash-equality alone doesn't explain.
"""

from pyspark.sql import functions as F

from tiflow_spark.plans.parity import _sched_tables


def _loads(df, col):
    return {
        r[col]: r["cnt"]
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_rebalance_invariants(spark, sf_dir):
    from tiflow_spark.operators.scheduler import hash_placement, rebalance_moves

    placed = hash_placement(_sched_tables(spark, sf_dir), 4)
    out = rebalance_moves(placed, 4).cache()
    n = out.count()
    upper = -(-n // 4)
    before = _loads(out, "current_capture")
    after = _loads(out, "target_capture")
    # post-balance: nobody above ceil(N/C)
    assert max(after.values()) <= upper
    # only over-limit captures lose tables; minimal move count
    expected_moves = sum(max(0, c - upper) for c in before.values())
    assert out.filter("moved").count() == expected_moves
    losers = {
        r["current_capture"] for r in out.filter("moved").collect()
    }
    assert all(before[c] > upper for c in losers)
    # no table leaves a capture only to land back over the limit elsewhere
    assert all(
        after.get(c, 0) <= upper for c in range(4)
    )
    out.unpersist()


def test_rebalance_already_balanced_is_noop(spark, sf_dir):
    """A perfectly balanced placement produces zero moves."""
    from tiflow_spark.operators.scheduler import rebalance_moves

    placed = _sched_tables(spark, sf_dir).withColumn(
        "current_capture",
        (F.dense_rank().over(__import__("pyspark").sql.Window.orderBy("table_name")) - 1)
        % 4,
    )
    out = rebalance_moves(placed, 4)
    assert out.filter("moved").count() == 0


def test_rebalance_max_moves_cap(spark, sf_dir):
    from tiflow_spark.operators.scheduler import hash_placement, rebalance_moves

    placed = hash_placement(_sched_tables(spark, sf_dir), 4)
    full = rebalance_moves(placed, 4).filter("moved").count()
    if full >= 2:
        capped = rebalance_moves(placed, 4, max_moves=1)
        assert capped.filter("moved").count() == 1


def test_drain_invariants(spark, sf_dir):
    from tiflow_spark.operators.scheduler import drain_moves, hash_placement

    placed = hash_placement(_sched_tables(spark, sf_dir), 4)
    out = drain_moves(placed, 4, drain=0).cache()
    n = out.count()
    before = _loads(out, "current_capture")
    after = _loads(out, "target_capture")
    # the drained capture ends empty; every one of its tables moved
    assert after.get(0, 0) == 0
    assert out.filter("moved").count() == before.get(0, 0)
    assert sum(after.values()) == n
    # greedy water-fill: any capture that received a table ends within 1
    # of every other survivor's final load
    receivers = {
        r["target_capture"] for r in out.filter("moved").collect()
    }
    for r in receivers:
        for s in (1, 2, 3):
            assert after.get(r, 0) <= after.get(s, 0) + 1
    out.unpersist()


def test_plans_have_no_cartesian_blowup(spark, sf_dir):
    """All cross joins are broadcast of 1-row aggregates / metadata slot
    frames; the data-scale shuffle is the single workload groupBy."""
    import io
    from contextlib import redirect_stdout

    from tiflow_spark.operators.scheduler import hash_placement, rebalance_moves

    placed = hash_placement(_sched_tables(spark, sf_dir), 4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rebalance_moves(placed, 4).explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()


def test_split_spans_invariants(spark, sf_dir):
    """Write-splitter invariants (splitter_write.go): spans cover every
    region exactly once in contiguous key order; each span's weight is
    within one max-region-weight of total/S; at most S spans."""
    from tiflow_spark.operators.scheduler import split_spans
    from tiflow_spark.plans.parity import _regions

    regions = _regions(spark, sf_dir).cache()
    S = 8
    spans = sorted(
        split_spans(regions, S).collect(), key=lambda r: r["span_id"]
    )
    assert len(spans) <= S
    total = sum(r["weight"] for r in regions.collect())
    n_regions = regions.count()
    max_w = max(r["weight"] for r in regions.collect())
    assert sum(s["n_regions"] for s in spans) == n_regions
    assert sum(s["weight"] for s in spans) == total
    # contiguity: consecutive spans' key ranges are ordered and disjoint
    for a, b in zip(spans, spans[1:]):
        assert a["end_key"] < b["start_key"]
    # balance: every span within limit + one region of the ideal share
    limit = total / S
    for s in spans:
        assert s["weight"] <= limit + max_w
    regions.unpersist()


def test_split_spans_unit_weight_is_count_splitter(spark):
    """weight=1 degenerates to the region-count splitter: S spans of
    equal region counts (N divisible by S here)."""
    from pyspark.sql import functions as F

    from tiflow_spark.operators.scheduler import split_spans

    regions = spark.range(64).select(
        F.col("id").alias("region_id"),
        (F.col("id") * 10).alias("start_key"),
        (F.col("id") * 10 + 9).alias("end_key"),
        F.lit(1).cast("long").alias("weight"),
    )
    spans = split_spans(regions, 8).collect()
    assert len(spans) == 8
    assert all(s["n_regions"] == 8 for s in spans)
