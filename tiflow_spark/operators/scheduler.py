"""Table scheduler: rebalance + drain-capture move planning.

The reference's scheduler-v3 coordinator plans table moves across capture
nodes (cdc/scheduler/internal/v3/scheduler/):

- rebalance (scheduler_rebalance.go:110-199 newBalanceMoveTables): compute
  ``upper = ceil(n_tables / n_captures)``; on each over-loaded capture the
  first ``load - upper`` tables in sorted span order become victims; each
  victim is then greedily assigned to the capture with the minimum current
  workload, incrementing it.
- drain capture (scheduler_drain_capture.go:73-190): ALL tables on the
  draining capture become victims; same greedy min-workload placement over
  the remaining captures.

Spark-first re-expression: greedy-to-min with unit weights is exactly a
water-fill, so the sequential loop becomes two window functions — no
driver-side loop at all:

- victims get a global rank ``v_idx`` (ordered by table name);
- every eligible capture emits capacity SLOTS ``load+1 .. level_cap``
  (one row per future table it can absorb), ranked by
  ``(level, capture_id)``;
- victim ``i`` moves to the capture owning slot ``i``.

Slot order (level asc, capture asc) IS the greedy order: a capture that
would reach load L is always filled before any capture already at L, and
ties break by capture id — the deterministic pin for the reference's Go
map-iteration tie-break (which is intentionally randomized there via
randomizeWorkload; we take the random=nil deterministic branch and pin the
tie). Everything is expressible in plain window SQL, so the whole planner
is DuckDB-oracle-checkable.

Scale shape: the tables frame is coordinator-metadata scale in the
reference too (the owner keeps every span in memory, spanz.BtreeMap) — the
single-partition global windows here hold n_tables rows, not data rows.
Deriving the per-table workloads from the fact table is the data-scale
part and is one map-side-combined shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tiflow_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)


def hash_placement(tables: DataFrame, n_captures: int) -> DataFrame:
    """Naive current placement: capture = portable_hash64(table) mod C.

    The pre-balance state — what you get from hash routing with no
    scheduler (and what the reference's basic scheduler produces before
    the balance scheduler kicks in)."""
    return tables.withColumn(
        "current_capture",
        F.pmod(portable_hash64(F.col("table_name")), F.lit(n_captures)),
    )


def _moves_from_slots(victims: DataFrame, slots: DataFrame) -> DataFrame:
    """Join victim rank to slot rank -> (table_name, target_capture)."""
    return victims.join(
        F.broadcast(slots), victims["v_idx"] == slots["slot_idx"]
    ).select("table_name", F.col("capture_id").alias("target_capture"))


def rebalance_moves(
    placed: DataFrame, n_captures: int, max_moves: int | None = None
) -> DataFrame:
    """Balance move plan over a (table_name, current_capture, ...) frame.

    Returns every input column plus target_capture and moved. Invariants
    (pinned by tests): post-balance every capture holds <= ceil(N/C)
    tables; only over-limit captures lose tables; the move count is the
    minimal sum(load - upper); move targets never exceed upper.
    """
    total = placed.agg(F.count(F.lit(1)).alias("n_tables"))
    upper_expr = F.expr(f"(n_tables + {n_captures - 1}) div {n_captures}")
    base = (
        placed.crossJoin(F.broadcast(total))
        .withColumn("upper", upper_expr)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("current_capture").orderBy("table_name")
            ),
        )
        .withColumn(
            "csz",
            F.count(F.lit(1)).over(Window.partitionBy("current_capture")),
        )
    )
    # reference victim pick: the FIRST (load - upper) spans in sorted order
    # leave the capture (scheduler_rebalance.go:152-166)
    base = base.withColumn(
        "is_victim", F.col("rn") <= F.col("csz") - F.col("upper")
    )
    victims = base.filter("is_victim").withColumn(
        "v_idx", F.row_number().over(Window.orderBy("table_name"))
    )
    if max_moves is not None:
        victims = victims.filter(F.col("v_idx") <= max_moves)
    spark = placed.sparkSession
    caps = spark.range(n_captures).select(F.col("id").alias("capture_id"))
    loads = (
        base.filter(~F.col("is_victim"))
        .groupBy(F.col("current_capture").alias("capture_id"))
        .agg(F.count(F.lit(1)).alias("load"), F.first("upper").alias("upper"))
    )
    u = total.select(
        upper_expr.alias("upper"), F.col("n_tables")
    )
    slots = (
        caps.join(F.broadcast(loads.drop("upper")), "capture_id", "left")
        .crossJoin(F.broadcast(u))
        .select(
            "capture_id",
            F.coalesce(F.col("load"), F.lit(0)).alias("load"),
            "upper",
        )
        .filter(F.col("load") < F.col("upper"))
        .select(
            "capture_id",
            F.explode(
                F.sequence(F.col("load") + 1, F.col("upper"))
            ).alias("level"),
        )
        .withColumn(
            "slot_idx",
            F.row_number().over(Window.orderBy("level", "capture_id")),
        )
    )
    moves = _moves_from_slots(
        victims.select("table_name", "v_idx"), slots
    )
    return (
        placed.join(F.broadcast(moves), "table_name", "left")
        .withColumn(
            "target_capture",
            F.coalesce(F.col("target_capture"), F.col("current_capture")),
        )
        .withColumn(
            "moved", F.col("target_capture") != F.col("current_capture")
        )
    )


def drain_moves(placed: DataFrame, n_captures: int, drain: int) -> DataFrame:
    """Drain-capture move plan: every table on `drain` moves to the
    min-workload remaining capture (scheduler_drain_capture.go:126-190),
    greedy == water-fill slots over the surviving captures."""
    victims = (
        placed.filter(F.col("current_capture") == drain)
        .withColumn("v_idx", F.row_number().over(Window.orderBy("table_name")))
        .select("table_name", "v_idx")
    )
    n_victims = victims.agg(F.count(F.lit(1)).alias("n_victims"))
    spark = placed.sparkSession
    caps = (
        spark.range(n_captures)
        .select(F.col("id").alias("capture_id"))
        .filter(F.col("capture_id") != drain)
    )
    loads = (
        placed.filter(F.col("current_capture") != drain)
        .groupBy(F.col("current_capture").alias("capture_id"))
        .agg(F.count(F.lit(1)).alias("load"))
    )
    # level bound: even if one capture absorbed every victim it tops out at
    # max(load) + n_victims — a metadata-scale sequence
    slots = (
        caps.join(F.broadcast(loads), "capture_id", "left")
        .crossJoin(F.broadcast(n_victims))
        .select(
            "capture_id",
            F.coalesce(F.col("load"), F.lit(0)).alias("load"),
            "n_victims",
        )
        # n_victims=0 would make sequence() count DOWN (Spark's start>stop
        # default step is -1) and mint bogus slots — gate it out
        .filter(F.col("n_victims") > 0)
        .select(
            "capture_id",
            F.explode(
                F.sequence(
                    F.col("load") + 1, F.col("load") + F.col("n_victims")
                )
            ).alias("level"),
        )
        .withColumn(
            "slot_idx",
            F.row_number().over(Window.orderBy("level", "capture_id")),
        )
    )
    moves = _moves_from_slots(victims, slots)
    return (
        placed.join(F.broadcast(moves), "table_name", "left")
        .withColumn(
            "target_capture",
            F.coalesce(F.col("target_capture"), F.col("current_capture")),
        )
        .withColumn(
            "moved", F.col("target_capture") != F.col("current_capture")
        )
    )


# ------------------------------------------------------------- oracle SQL


def _placement_sql(n_captures: int) -> str:
    h = portable_hash64_sql_duckdb("table_name")
    return (
        f"(((({h}) % {n_captures}) + {n_captures}) % {n_captures})"
    )


def rebalance_sql(tables_cte: str, n_captures: int) -> str:
    """DuckDB mirror of hash_placement + rebalance_moves over a CTE named
    `tables` providing (table_name, weight)."""
    c = n_captures
    return f"""WITH {tables_cte},
placed AS (
  SELECT table_name, weight, {_placement_sql(c)} AS current_capture
  FROM tables
),
tot AS (SELECT count(*) AS n_tables, (count(*) + {c - 1}) // {c} AS upper
        FROM placed),
base AS (
  SELECT p.*, t.upper,
         row_number() OVER (PARTITION BY current_capture
                            ORDER BY table_name) AS rn,
         count(*) OVER (PARTITION BY current_capture) AS csz
  FROM placed p CROSS JOIN tot t
),
victims AS (
  SELECT table_name,
         row_number() OVER (ORDER BY table_name) AS v_idx
  FROM base WHERE rn <= csz - upper
),
loads AS (
  SELECT caps.capture_id,
         coalesce(l.load, 0) AS load, t.upper
  FROM (SELECT unnest(range({c})) AS capture_id) caps
  CROSS JOIN tot t
  LEFT JOIN (SELECT current_capture AS capture_id, count(*) AS load
             FROM base WHERE rn > csz - upper GROUP BY 1) l
    USING (capture_id)
),
slots AS (
  SELECT capture_id, level,
         row_number() OVER (ORDER BY level, capture_id) AS slot_idx
  FROM (SELECT capture_id, unnest(range(load + 1, upper + 1)) AS level
        FROM loads WHERE load < upper)
),
moves AS (
  SELECT v.table_name, s.capture_id AS target_capture
  FROM victims v JOIN slots s ON v.v_idx = s.slot_idx
)
SELECT p.table_name, p.weight, p.current_capture,
       coalesce(m.target_capture, p.current_capture) AS target_capture,
       coalesce(m.target_capture, p.current_capture) <> p.current_capture
         AS moved
FROM placed p LEFT JOIN moves m USING (table_name)"""


def drain_sql(tables_cte: str, n_captures: int, drain: int) -> str:
    """DuckDB mirror of hash_placement + drain_moves."""
    c = n_captures
    return f"""WITH {tables_cte},
placed AS (
  SELECT table_name, weight, {_placement_sql(c)} AS current_capture
  FROM tables
),
victims AS (
  SELECT table_name,
         row_number() OVER (ORDER BY table_name) AS v_idx
  FROM placed WHERE current_capture = {drain}
),
nv AS (SELECT count(*) AS n_victims FROM victims),
loads AS (
  SELECT caps.capture_id, coalesce(l.load, 0) AS load, nv.n_victims
  FROM (SELECT unnest(range({c})) AS capture_id) caps
  CROSS JOIN nv
  LEFT JOIN (SELECT current_capture AS capture_id, count(*) AS load
             FROM placed WHERE current_capture <> {drain} GROUP BY 1) l
    USING (capture_id)
  WHERE caps.capture_id <> {drain}
),
slots AS (
  SELECT capture_id, level,
         row_number() OVER (ORDER BY level, capture_id) AS slot_idx
  FROM (SELECT capture_id,
               unnest(range(load + 1, load + n_victims + 1)) AS level
        FROM loads)
),
moves AS (
  SELECT v.table_name, s.capture_id AS target_capture
  FROM victims v JOIN slots s ON v.v_idx = s.slot_idx
)
SELECT p.table_name, p.weight, p.current_capture,
       coalesce(m.target_capture, p.current_capture) AS target_capture,
       coalesce(m.target_capture, p.current_capture) <> p.current_capture
         AS moved
FROM placed p LEFT JOIN moves m USING (table_name)"""


# --------------------------------------------------------- keyspan splitter


def split_spans(regions: DataFrame, n_spans: int) -> DataFrame:
    """Split a table's contiguous regions into <= n_spans spans of
    approximately equal write weight — the keyspan write splitter
    (keyspan/splitter_write.go:115-210 splitRegionsByWrittenKeysV1:
    writeLimitPerSpan = total/baseSpansNum, consecutive regions
    accumulate until the limit). With weight=1 it degenerates to the
    region-count splitter (splitter_region_count.go).

    Re-expression: the sequential accumulate-until-limit loop becomes the
    closed-form proportional cut-point assignment
    ``span_id = (cum_weight_before * S) div total`` — a prefix sum over
    the region frame (REGION METADATA, the same scale the reference's
    coordinator holds in memory; the data-scale work is deriving region
    weights, a distributed agg the caller does). Invariants preserved:
    spans cover consecutive regions, each span's weight is within one
    max-region-weight of total/S, at most S spans. Integer math
    throughout, so engine-exact.

    Input: (region_id, start_key, end_key, weight); output one row per
    span: (span_id, start_key, end_key, n_regions, weight).
    """
    total = regions.agg(F.sum("weight").alias("total"))
    w = Window.orderBy("region_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    assigned = (
        regions.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_before", F.coalesce(F.sum("weight").over(w), F.lit(0))
        )
        .withColumn(
            "span_id",
            F.least(
                F.expr(f"(cum_before * {n_spans}) div total"),
                F.lit(n_spans - 1).cast("long"),
            ),
        )
    )
    return assigned.groupBy("span_id").agg(
        F.min("start_key").alias("start_key"),
        F.max("end_key").alias("end_key"),
        F.count(F.lit(1)).alias("n_regions"),
        F.sum("weight").alias("weight"),
    )


def split_spans_sql(regions_cte: str, n_spans: int) -> str:
    """DuckDB mirror of split_spans over a CTE named `regions`."""
    s = n_spans
    return f"""WITH {regions_cte},
tot AS (SELECT CAST(sum(weight) AS BIGINT) AS total FROM regions),
assigned AS (
  SELECT r.*,
         least(
           (CAST(coalesce(sum(weight) OVER (ORDER BY region_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) * {s}) // t.total,
           CAST({s - 1} AS BIGINT)) AS span_id
  FROM regions r CROSS JOIN tot t
)
SELECT span_id, min(start_key) AS start_key, max(end_key) AS end_key,
       count(*) AS n_regions, CAST(sum(weight) AS BIGINT) AS weight
FROM assigned GROUP BY 1"""
