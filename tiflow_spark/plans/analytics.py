"""Analytic queries over the TPC-H-ish tables — the general SQL surface.

The reference is a replication platform, not a SQL engine; these queries
demonstrate the analytics capabilities the new engine adds on top of parity
(BASELINE.json north star) and act as bench headliners.

Determinism note: money sums go through round(…,2) → DECIMAL(18,2) so the
aggregation is exact integer arithmetic in both engines (double-sum order
would otherwise make value-hashes flap), then cast back to double for a
stable representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.envelope import load_table


def _dec_sum(c) -> F.Column:
    return F.sum(F.round(c, 2).cast("decimal(18,2)")).cast("double")


def _dec(name: str) -> F.Column:
    """Column as exact DECIMAL(18,2); all downstream arithmetic stays decimal
    so the result is engine-independent (double products round half-way
    points differently between Spark and DuckDB)."""
    return F.col(name).cast("decimal(18,2)")


def _revenue_sum() -> F.Column:
    """sum(extendedprice * (1 - discount)) in exact decimal arithmetic."""
    return F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")


_REVENUE_SQL = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary report."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        # compare against a timestamp_ntz literal: the scan column is NTZ, so
        # an LTZ literal would wrap the column in a cast and kill parquet
        # pushdown; matched types keep it a plain PushedFilter
        li.filter(F.col("l_shipdate") <= F.lit("2024-06-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _revenue_sum().alias("sum_disc_price"),
            # decimal-exact sum / exact int count → bit-identical double on
            # any engine; float avg() is summation-order-dependent and flaps
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
    AS sum_base_price,
  {rev} AS sum_disc_price,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-06-01'
GROUP BY 1, 2""".format(rev=_REVENUE_SQL)


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 undelivered orders by revenue for a segment.

    Plan shape: customer filter → broadcast to orders join → lineitem join
    shuffles on orderkey only; top-k via global sort of the tiny aggregate."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") < F.lit("2024-03-15").cast("timestamp_ntz"))
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        _revenue_sum().alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(10)


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate,
  {_REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2024-03-15'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10"""


def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (daily) event rollup — the batch face of the
    streaming windowed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("user_id").alias("users"),
        _dec_sum(F.col("value")).alias("value_sum"),
    )


DAILY_EVENT_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
  count(*) AS events, count(DISTINCT user_id) AS users,
  CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1, 2"""


def top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region top-3 customers by account balance (window rank over a
    broadcast dimension join)."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    j = cust.join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
    w = Window.partitionBy("r_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("r_name", "rank", "c_custkey", "c_acctbal")
    )


TOP_SPENDERS_SQL = """
SELECT r_name, rank, c_custkey, c_acctbal FROM (
  SELECT r_name, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY r_name
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
) WHERE rank <= 3"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share
    the nation, one region, one year.

    Plan shape: region→nation (tiny) broadcast down the chain; the only
    big shuffle is lineitem⋈orders on orderkey; supplier/customer joins
    broadcast. At 100 TB: one fact shuffle, four broadcasts."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nr), supp.s_nationkey == nr.n_nationkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            _revenue_sum().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name AS nation,
  {_REVENUE_SQL} AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY 1"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: customers with orders above a quantity threshold —
    aggregate-then-semi-join; the big side never re-shuffles for the
    semi-join because the hot order list broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    j = (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.round(F.col("total_qty"), 2).alias("total_qty"),
    )


LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey"""


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: per-priority count of orders in a quarter that had at
    least one line shipped after the order date (the testdata lacks
    l_commitdate/l_receiptdate, so ship-after-order is the lateness
    predicate). Plan shape: pushed date-range scan on orders, left-semi
    join on orderkey — the EXISTS never duplicates orders."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1"""


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: for lines shipped >= 60 days after their order in
    1996, split line counts by return flag into critical
    (URGENT/HIGH-priority orders) vs ordinary — one shuffle on orderkey,
    conditional aggregation instead of two scans."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate")
        >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~crit, 1).otherwise(0)).alias("low_line_count"),
    )


LATE_SHIPMENT_SQL = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
GROUP BY 1"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: PROMO part types' share of revenue for one quarter.
    Part dimension broadcasts; revenue arithmetic stays decimal-exact and
    the final percentage rounds to a hash-stable 4 places."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )).alias("_promo"),
        F.sum(rev).alias("_total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


PROMO_REVENUE_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(18,2))
         * (1 - CAST(l_discount AS DECIMAL(18,2)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'"""


def user_sessions(
    spark: SparkSession, sf_dir: str, gap_min: int = 30
) -> DataFrame:
    """Sessionization: split each user's event stream at inactivity gaps
    > gap_min — the batch face of streaming session windows. One shuffle
    (user_id); both the lag flag and the running session counter reuse
    the same sort order."""
    from pyspark.sql import Window

    from tiflow_spark.envelope import epoch_us

    gap_us = gap_min * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("tus"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("tus").over(w)
    flag = F.when(
        prev.isNull() | (F.col("tus") - prev > gap_us), 1
    ).otherwise(0)
    s = ev.withColumn("ns", flag).withColumn(
        "session_seq", F.sum("ns").over(run)
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.min("tus").alias("session_start"),
        F.max("tus").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        _dec_sum(F.col("value")).alias("value_sum"),
    )


USER_SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events
),
f AS (
  SELECT *,
    CASE WHEN lag(tus) OVER w IS NULL
           OR tus - lag(tus) OVER w > 1800000000
         THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *,
    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM f
)
SELECT user_id, session_seq, min(tus) AS session_start,
       max(tus) AS session_end, count(*) AS n_events,
       CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
         AS value_sum
FROM s GROUP BY 1, 2"""


def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style shipping volume between two nation groups: revenue of
    lineitems shipped supplier-nation → customer-nation for a nation pair,
    by year. Both nation dims broadcast; lineitem⋈orders is the only big
    join (on orderkey) and the date filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # pair populated at every test scale incl. sf0.001
    pair = (("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == pair[0][0]) & (F.col("cust_nation") == pair[0][1]))
            | ((F.col("supp_nation") == pair[1][0]) & (F.col("cust_nation") == pair[1][1]))
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(
        _dec_sum(
            _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).alias("revenue")
    )


NATION_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(
         CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))),
         2) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
GROUP BY 1, 2, 3"""


def sliding_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window event rate: 1-hour windows sliding every 15 minutes
    (each event lands in 4 overlapping windows) — Spark's native
    F.window(slide) operator; the streaming face is identical plus a
    watermark. One shuffle keyed by window start."""
    ev = load_table(spark, sf_dir, "events")
    from tiflow_spark.envelope import epoch_us

    w = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(
            epoch_us("w.start").alias("window_start"),
            "event_type",
            "events",
            "users",
        )
    )


SLIDING_EVENT_RATE_SQL = """
WITH slid AS (
  SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)
                  - j * INTERVAL 15 MINUTE) AS window_start,
         event_type, user_id
  FROM events, unnest([0, 1, 2, 3]) AS t(j)
)
SELECT window_start, event_type,
       count(*) AS events, count(DISTINCT user_id) AS users
FROM slid GROUP BY 1, 2"""


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under a disjunction of (brand, size,
    quantity) conjunctions — the classic test that an OR-of-ANDs predicate
    still evaluates as ONE pass (single broadcast join, predicate in the
    join, no union-of-three-scans). Exact decimal revenue → double."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return j.filter(arm).agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        )
        .cast("double")
        .alias("revenue")
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT {_REVENUE_SQL} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue of orders below 20% of their part's average
    quantity — a correlated scalar subquery Catalyst must decorrelate into
    a per-part aggregate + join (never a per-row re-scan). Quantities are
    integral doubles, so per-part averages are exact-rounded and
    order-independent; revenue stays decimal until the final division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return j.agg(
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 4
        ).alias("avg_yearly")
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM lineitem l JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)"""


def lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: per nation, count customers with above-average
    positive balances who have placed NO urgent orders — the left-anti
    join + uncorrelated scalar-average shape. (Plain "no orders" is empty
    at the tiny test scales, so the anti side filters to 1-URGENT; the
    join shape is identical.) The average is sum(DECIMAL) cast to double
    ÷ count (one correctly-rounded division, order-independent) and
    per-nation totals stay decimal until the final cast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("ab")
    )
    rich = pos.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


LOST_CUSTOMERS_SQL = """
WITH ab AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, ab
WHERE c_acctbal > 0.0 AND c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the ONLY late shipper on a
    multi-supplier order — a semi-join (another supplier participated) plus
    an anti-join (no other supplier was also late) over the same fact
    table. Late = shipped after the order's 80th percentile... simplified:
    l_shipdate in the last 30 days of the order's lineitem span. Counts
    only — integer-exact across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    span = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("max_ship"))
    flagged = li.join(span, "l_orderkey").withColumn(
        "late", F.col("l_shipdate") == F.col("max_ship")
    )
    # ONE deduped (orderkey, suppkey, any_late) frame serves the driving
    # side, the semi side, AND the anti side — the naive form shuffled the
    # fact table twice more for two separate `distinct` projections; all
    # three branches now share a single (orderkey, suppkey) exchange
    # (ReusedExchange in the plan, pinned by test_plan_contracts).
    participants = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late")
    )
    others = participants.select(
        F.col("l_orderkey").alias("o2"),
        F.col("l_suppkey").alias("s2"),
        F.col("any_late").alias("late2"),
    )
    l1 = participants.filter(F.col("any_late")).drop("any_late")
    has_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    sole_late = has_other.join(
        others.filter(F.col("late2")),
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_anti",
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count("l_orderkey").alias("numwait"))
        .filter(F.col("numwait") >= 2)
    )


WAITING_SUPPLIERS_SQL = """
WITH span AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY 1
),
flagged AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate = s.max_ship AS late
  FROM lineitem l JOIN span s ON l.l_orderkey = s.l_orderkey
),
l1 AS (SELECT * FROM flagged WHERE late)
SELECT l_suppkey, count(DISTINCT l_orderkey) AS numwait
FROM l1
WHERE EXISTS (
    SELECT 1 FROM lineitem o
    WHERE o.l_orderkey = l1.l_orderkey AND o.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM flagged f
    WHERE f.l_orderkey = l1.l_orderkey AND f.l_suppkey <> l1.l_suppkey
      AND f.late)
GROUP BY 1
HAVING count(DISTINCT l_orderkey) >= 2"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) with the maximum quarterly revenue —
    an aggregate reused twice (revenue per supplier, then its max as a
    scalar) without recomputing the CTE, and exact-decimal revenue so the
    max-equality match is well-defined (double sums would make 'equals
    the max' flap across engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
    )


TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)"""


def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returned items per customer over
    one quarter, top 20 by revenue.

    Plan shape: ONE fact shuffle (lineitem⋈orders on orderkey, both date/
    flag filters pushed to the parquet scans first); customer and nation
    broadcast; top-20 via a global sort of the (small) per-customer
    aggregate with deterministic (revenue DESC, custkey) tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"),
        "n_name",
    ).agg(_revenue_sum().alias("revenue"))
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
  {_REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20"""


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    INCLUDING zero-order customers (the left outer join Q13 exists to
    test).

    Plan shape: one left join customer⋈orders on custkey (orders side
    pre-aggregated to per-customer counts first, so the join carries one
    row per customer per side, not one per order), then a tiny second
    groupBy on the count."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    j = cust.join(
        per_cust, cust.c_custkey == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    return j.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey,
    (SELECT count(*) FROM orders
     WHERE o_custkey = c_custkey AND o_orderpriority <> '5-LOW') AS c_count
  FROM customer
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1"""


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style (partsupp-free variant over lineitem): parts whose
    total traded value exceeds 1.25x the MEAN part value — a per-group
    aggregate HAVING against a global scalar. TPC-H scales Q11's fraction
    by 1/SF for exactly this reason: a fixed share-of-total threshold
    empties as the part count grows (at sf0.1, ~30 uniform lineitems per
    part concentrate every part within ~1.7x the mean, so the old
    0.05%-of-total bar exceeded the maximum). Mean-relative is the
    scale-stable form of the same shape.

    Plan shape: ONE shuffle on partkey builds the per-part totals; the
    global total AND part count derive from the SAME aggregate
    (re-aggregation of the per-part frame, metadata-sized) and broadcast
    back — the fact table is scanned and shuffled once, not twice."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            _dec("l_extendedprice") * F.col("l_quantity").cast("decimal(18,2)")
        ).alias("_val")
    )
    total = per_part.agg(
        F.sum("_val").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    # threshold compare in DOUBLE space with the identical expression on
    # the oracle side: both engines compute the same double ops on the
    # same exact-decimal sums, so the comparison is engine-independent
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_val").cast("double")
            > F.lit(1.25) * F.col("_total").cast("double") / F.col("_n")
        )
        .select(
            "l_partkey", F.col("_val").cast("double").alias("part_value")
        )
    )


IMPORTANT_PARTS_SQL = """
WITH per_part AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(l_quantity AS DECIMAL(18,2))) AS val
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val AS DOUBLE)
      > 1.25 * (SELECT CAST(sum(val) AS DOUBLE) FROM per_part)
             / (SELECT count(*) FROM per_part)"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral trade volume between two nations by year
    — supplier in one nation, customer in the other, both directions,
    grouped by (supp_nation, cust_nation, year).

    Plan shape: one lineitem⋈orders shuffle on orderkey; supplier,
    customer and the nation pair filter all broadcast; year() is computed
    post-join (cheap), the nation-pair predicate prunes rows at the
    broadcast joins."""
    n1 = ("NATION_3", "NATION_7")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.filter(F.col("n_name").isin(*n1))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.filter(F.col("n_name").isin(*n1))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(_revenue_sum().alias("revenue"), F.count(F.lit(1)).alias("n_items"))


VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  {_REVENUE_SQL} AS revenue, count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_3', 'NATION_7')
  AND cn.n_name IN ('NATION_3', 'NATION_7')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's share of a region's yearly revenue —
    supplier-side nation attribution, customers restricted to the region.

    Share = nation revenue / region revenue per year: both sides are
    exact-decimal sums; ONE final double division (identical IEEE op on
    identical inputs in both engines — the engine-portable ratio recipe).

    Plan shape: one lineitem⋈orders shuffle on orderkey; supplier and the
    region-restricted customer side broadcast; the share divides two
    columns of the SAME per-year aggregate row (conditional aggregation —
    no second pass, no self-join)."""
    nation = load_table(spark, sf_dir, "nation")
    region_nations = nation.filter(F.col("n_regionkey") == 2)
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(region_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    per_year = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_11", rev)).alias("_n"),
        F.sum(rev).alias("_d"),
    )
    return per_year.select(
        "o_year",
        F.coalesce(F.col("_n"), F.lit(0)).cast("double").alias("nation_rev"),
        F.col("_d").cast("double").alias("region_rev"),
        (
            F.coalesce(F.col("_n"), F.lit(0)).cast("double")
            / F.col("_d").cast("double")
        ).alias("mkt_share"),
    )


MARKET_SHARE_SQL = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
    sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_regionkey = 2
)
SELECT o_year,
  CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_11' THEN rev END), 0)
       AS DOUBLE) AS nation_rev,
  CAST(sum(rev) AS DOUBLE) AS region_rev,
  CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_11' THEN rev END), 0)
       AS DOUBLE) / CAST(sum(rev) AS DOUBLE) AS mkt_share
FROM j GROUP BY 1"""


# ------------------------- partsupp-analog suite (Q2 / Q16 / Q20 shapes)
#
# /root/testdata has no partsupp table; the analog is derived IDENTICALLY
# in Spark and the DuckDB oracle from lineitem: one (l_partkey, l_suppkey)
# aggregate with exact-decimal min cost / total quantity. That unblocks the
# three TPC-H plan shapes the olap set lacked: min-cost-per-group
# correlated lookup (Q2), distinct-count with exclusion anti-join (Q16),
# and semi-join on a per-pair aggregate threshold (Q20).

_PS_SQL = """ps AS (
  SELECT l_partkey, l_suppkey,
    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


def _partsupp(li: DataFrame) -> DataFrame:
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("ps_supplycost"),
        F.sum(_dec("l_quantity")).alias("ps_availqty"),
    )


def mincost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each mid-size ECONOMY part, the EUROPE
    supplier(s) achieving the minimum supply cost — the correlated
    min-subquery shape, expressed as a window min over the derived
    partsupp frame.

    Plan shape: lineitem shuffles ONCE on (partkey, suppkey) to build ps;
    part filter and the region→nation→supplier chain broadcast into it;
    the per-part min is a window over the already-reduced candidate frame
    (one partkey shuffle of candidates, not of lineitem). Min-cost
    equality compares in exact decimal."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_brand")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        _partsupp(li)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_mc"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


MINCOST_SUPPLIER_SQL = f"""
WITH {_PS_SQL},
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, ps_supplycost,
         min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
  FROM ps
  JOIN part ON l_partkey = p_partkey
   AND p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY'
  JOIN eu ON l_suppkey = s_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM cand WHERE ps_supplycost = mc"""


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding one brand, one type, and
    low-balance ("customer complaints") suppliers.

    Plan shape: ps (one lineitem shuffle) ⋈ broadcast part filter;
    the excluded-supplier set broadcasts as a LEFT ANTI join (the NOT IN
    subquery); countDistinct adds the one group-key shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 500
    ).select("s_suppkey")
    return (
        _partsupp(li)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_PART_COUNTS_SQL = f"""
WITH {_PS_SQL}
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
GROUP BY 1, 2, 3"""


def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers holding excess stock of widget parts —
    pairs whose all-time quantity exceeds twice what they shipped in 1997
    (the semi-join-on-aggregate shape; exact-decimal threshold compare,
    2*qty stays integer-exact).

    Plan shape: one lineitem shuffle builds per-pair totals WITH the
    conditional 1997 sum in the same aggregate (no second scan); part
    filter broadcasts; the qualifying-supplier set is distinct-reduced
    (tiny) and broadcasts as a LEFT SEMI join into supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget")
    ).select("p_partkey")
    pairs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("total_qty"),
        F.sum(
            F.when(
                F.year("l_shipdate") == 1997, _dec("l_quantity")
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("qty_1997"),
    )
    qualifying = (
        pairs.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .filter(
            (F.col("qty_1997") > 0)
            & (F.col("total_qty") > F.lit(2) * F.col("qty_1997"))
        )
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(qualifying),
            supplier.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


EXCESS_SUPPLIERS_SQL = """
WITH flt AS (
  SELECT l_partkey, l_suppkey,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty,
    sum(CASE WHEN year(l_shipdate) = 1997
             THEN CAST(l_quantity AS DECIMAL(18,2))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1997
  FROM lineitem GROUP BY 1, 2
),
q AS (
  SELECT DISTINCT l_suppkey FROM flt
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget'
  WHERE qty_1997 > 0 AND total_qty > 2 * qty_1997
)
SELECT s_suppkey, s_name, s_acctbal, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM q)"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: per-nation yearly profit on widget parts — revenue
    minus supply cost, the cost taken from the derived partsupp analog.

    Plan shape: ps derives from lineitem with ONE (partkey, suppkey)
    shuffle and joins back on the same keys; orders joins on orderkey
    (the second fact shuffle); part / supplier / nation broadcast. The
    whole profit expression stays exact decimal until the final double
    cast — sum order cannot flap the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    # ps is only ever consumed through the INNER join on widget partkeys,
    # so pre-filtering its build with the same broadcast part set (semi
    # join, map-only) is result-identical while shrinking the
    # (partkey, suppkey) aggregation shuffle to the widget slice — the
    # guide's reduce-the-big-side-before-the-exchange move (r14)
    li_w = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi"
    )
    ps = li_w.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(_dec("l_extendedprice")).alias("ps_supplycost"))
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    ) - F.col("ps_supplycost") * _dec("l_quantity")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        F.sum(amount).cast("double").alias("sum_profit"),
        F.count(F.lit(1)).alias("n_items"),
    )


PRODUCT_PROFIT_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(18,2)))
      - ps_supplycost * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
    AS sum_profit,
  count(*) AS n_items
FROM lineitem
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: revenue increase from dropping a discount band —
    one filtered scan, one scalar aggregate, every predicate pushed to
    parquet (timestamp_ntz literals keep shipdate pushdown alive)."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    f = li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


FORECAST_REVENUE_SQL = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""
