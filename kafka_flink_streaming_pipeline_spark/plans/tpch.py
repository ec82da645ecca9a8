"""Star-schema analytical plans over the driver's TPC-H-ish tables.

The reference's operator surface (SURVEY.md §2) includes batch equi-joins
(J2/J3), broadcast of tiny aggregates (J4), two-phase hash aggregation
(A3-A8) and rank windows (W1). The clickstream corpus exercises them on
one table; these plans exercise the same operators across multi-table
joins at bench scale (sf0.1: 600k lineitem), plus semi/anti joins —
operators Spark offers beyond the reference, included for the
training-pipeline surface.

Scale design:
- `region`/`nation`/`supplier` are broadcast (dimension tables stay tiny
  relative to facts at any SF) — no shuffle of the fact side for those
  joins; customer⋈orders⋈lineitem are shuffle joins on their keys, which
  AQE re-plans to broadcast when a filtered side fits.
- Money arithmetic casts to DECIMAL(18,2) in BOTH engines before
  summing: decimal sums are exact, so results are independent of
  partition/summation order — the only way a distributed sum can
  hash-match a single-threaded oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import (
    load_table,
    load_table_parallel,
)


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# --- pricing summary (TPC-H Q1 shape; A3/A5 aggregate battery) ------------


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decimal-arithmetic battery over the full fact table: the per-row
    # CPU dominates the scan, so restore map-side parallelism when the
    # input arrives as one split (r13; see load_table_parallel)
    li = load_table_parallel(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TPCH_Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)       AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)  AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
                (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- shipping priority (TPC-H Q3 shape; 3-way join + top-k) ---------------


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_TPCH_Q3_ORACLE = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- regional revenue (TPC-H Q5 shape; broadcast dim chain) ---------------


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        # TPC-H requires customer and supplier in the same nation
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "r_name", "n_name")
    )


_TPCH_Q5_ORACLE = """
SELECT r_name,
       n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
ORDER BY revenue DESC, r_name, n_name
"""


# --- top supplier per nation (W1 rank window on star schema) --------------


def _top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal", "rn")
        .orderBy("n_name", "rn")
    )


_TOP_SUPPLIER_ORACLE = """
SELECT n_name, s_suppkey, s_name, s_acctbal, rn
FROM (
  SELECT n_name, s_suppkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
) t
WHERE rn <= 3
ORDER BY n_name, rn
"""


# --- order priority w/ EXISTS (semi join — TPC-H Q4 shape) ----------------


def _order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- customers without orders (anti join) ---------------------------------


def _cust_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scoped to recent orders: on this data every customer has *some*
    # order, so the unscoped anti join would be vacuously empty.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("lapsed_customers"))
        .orderBy("c_mktsegment")
    )


_CUST_NO_ORDERS_ORACLE = """
SELECT c_mktsegment, count(*) AS lapsed_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- literal outer joins (J1/J2 operator forms) ---------------------------
#
# FP2/FP3 implement the reference's outer-join *semantics* via the
# union-pivot (the scale-correct form); these exercise the literal
# left/right outer join operators with COALESCE over the null side —
# the exact J2 shape of feature_batch_update.py:85-113.


def _cust_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    counts = recent.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "left_outer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n"), F.lit(0)).alias("recent_orders"),
        )
        .orderBy("c_custkey")
    )


_CUST_LEFT_JOIN_ORACLE = """
SELECT c_custkey, c_mktsegment, COALESCE(n, 0) AS recent_orders
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS n
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY o_custkey
) o ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def _orders_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2 literal: aggregate RIGHT JOIN aggregate with COALESCE on both
    # key sides, exactly like the 20-min feature batch job.
    li = load_table(spark, sf_dir, "lineitem")
    hi = (
        li.filter(F.col("l_discount") >= 0.08)
        .groupBy(F.col("l_orderkey").alias("k1"))
        .agg(F.count("*").alias("hi_disc_items"))
    )
    all_items = li.groupBy(F.col("l_orderkey").alias("k2")).agg(
        F.count("*").alias("items")
    )
    return (
        hi.join(all_items, hi.k1 == all_items.k2, "right_outer")
        .select(
            F.coalesce(F.col("k1"), F.col("k2")).alias("l_orderkey"),
            F.coalesce(F.col("hi_disc_items"), F.lit(0)).alias("hi_disc_items"),
            F.col("items"),
        )
        .orderBy("l_orderkey")
    )


_ORDERS_RIGHT_JOIN_ORACLE = """
SELECT COALESCE(h.k1, a.k2) AS l_orderkey,
       COALESCE(h.hi_disc_items, 0) AS hi_disc_items,
       a.items
FROM (
  SELECT l_orderkey AS k1, count(*) AS hi_disc_items
  FROM lineitem WHERE l_discount >= 0.08 GROUP BY l_orderkey
) h
RIGHT JOIN (
  SELECT l_orderkey AS k2, count(*) AS items
  FROM lineitem GROUP BY l_orderkey
) a ON h.k1 = a.k2
ORDER BY l_orderkey
"""


# --- forecast revenue (TPC-H Q6 shape; pure scan-side filter + agg) -------


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table band filters + one global sum — every predicate is
    parquet-pushable (shipdate range, discount band, quantity cap), so
    at 100 TB this reads only the row groups whose min/max stats
    overlap the bands."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").cast("decimal(18,2)") >= F.lit("0.05").cast("decimal(18,2)"))
            & (F.col("l_discount").cast("decimal(18,2)") <= F.lit("0.07").cast("decimal(18,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_TPCH_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST('0.05' AS DECIMAL(18,2))
                                            AND CAST('0.07' AS DECIMAL(18,2))
  AND l_quantity < 24
"""


# --- order priority with EXISTS (TPC-H Q4 shape; correlated semi-join) ----


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS with a non-equi correlation (a line shipped >90 days
    after the order date) → LEFT SEMI join with a composite condition.
    (Classic Q4 uses commitdate/receiptdate, absent from this schema;
    the late-shipment predicate keeps the same correlated-EXISTS
    shape.) The semi join shuffles on o_orderkey/l_orderkey only and
    keeps at most one probe hit per order — no fact-fact row blowup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- returned-item revenue per customer (TPC-H Q10 shape; 4-way join) -----


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem(returnflag='R') ⋈ nation, revenue
    per customer, top-20. The two dims broadcast; the fact-fact join
    shuffles on the order key; revenue uses the exact decimal formula.
    Tiebreak on c_custkey pins the LIMIT frontier in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_TPCH_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def _q2_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point (`spark.sql` over registered views) — the
    same Q2 top-docs plan authored as SQL text instead of DataFrame
    calls; Catalyst produces the identical physical plan, proving the
    engine's surface is reachable from either API."""
    from kafka_flink_streaming_pipeline_spark.sources.batch import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH enriched AS (
          SELECT CAST(get_json_object(props, '$.k') AS BIGINT) AS document_id,
                 ts AS event_time
          FROM events
        ),
        latest AS (SELECT max(event_time) AS max_ts FROM enriched)
        SELECT document_id, count(*) AS impressions
        FROM enriched, latest
        WHERE event_time >= max_ts - INTERVAL 6 HOURS
        GROUP BY document_id
        ORDER BY impressions DESC, document_id ASC
        LIMIT 10
        """
    )


_Q2_SQL_API_ORACLE = """
WITH enriched AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS document_id,
         ts AS event_time
  FROM events
),
latest AS (SELECT max(event_time) AS max_ts FROM enriched)
SELECT document_id, count(*) AS impressions
FROM enriched, latest
WHERE event_time >= max_ts - INTERVAL 6 HOUR
GROUP BY document_id
ORDER BY impressions DESC, document_id ASC
LIMIT 10
"""


def _cust_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-customer year aggregates — completes
    the join-type family (inner/left/right/semi/anti/cross are covered
    elsewhere). Customers active in only one of the two years appear
    with a NULL side; COALESCE canonicalizes both the key and the
    counts, the same both-sides treatment FP3's reference RIGHT JOIN
    hints it wanted (SURVEY.md §7 'RIGHT JOIN vs FULL OUTER intent')."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = (
        orders.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("k95"))
        .agg(F.count("*").alias("n95"))
    )
    y01 = (
        orders.filter(F.year("o_orderdate") == 2001)
        .groupBy(F.col("o_custkey").alias("k01"))
        .agg(F.count("*").alias("n01"))
    )
    return (
        y95.join(y01, F.col("k95") == F.col("k01"), "full_outer")
        .select(
            F.coalesce(F.col("k95"), F.col("k01")).alias("custkey"),
            F.coalesce(F.col("n95"), F.lit(0)).alias("orders_1995"),
            F.coalesce(F.col("n01"), F.lit(0)).alias("orders_2001"),
        )
        .orderBy("custkey")
    )


_CUST_FULL_OUTER_ORACLE = """
SELECT COALESCE(k95, k01) AS custkey,
       COALESCE(n95, 0) AS orders_1995,
       COALESCE(n01, 0) AS orders_2001
FROM (SELECT o_custkey AS k95, count(*) AS n95 FROM orders
      WHERE year(o_orderdate) = 1995 GROUP BY o_custkey) a
FULL OUTER JOIN
     (SELECT o_custkey AS k01, count(*) AS n01 FROM orders
      WHERE year(o_orderdate) = 2001 GROUP BY o_custkey) b
  ON k95 = k01
ORDER BY custkey
"""


QUERIES: dict[str, QuerySpec] = {
    "customer_activity_full_outer_join": QuerySpec(
        "customer_activity_full_outer_join",
        _cust_full_outer,
        _CUST_FULL_OUTER_ORACLE,
        "FULL OUTER join of two aggregates + both-sides COALESCE",
    ),
    "tpch_q10_returned_items": QuerySpec(
        "tpch_q10_returned_items", _q10, _TPCH_Q10_ORACLE, "returned-item revenue top-20 (Q10)"
    ),
    "q2_sql_api_variant": QuerySpec(
        "q2_sql_api_variant",
        _q2_sql_api,
        _Q2_SQL_API_ORACLE,
        "Q2 authored via spark.sql over registered views",
    ),
    "tpch_q4_order_priority": QuerySpec(
        "tpch_q4_order_priority", _q4, _TPCH_Q4_ORACLE, "correlated EXISTS → semi join (Q4)"
    ),
    "tpch_q6_forecast_revenue": QuerySpec(
        "tpch_q6_forecast_revenue", _q6, _TPCH_Q6_ORACLE, "band-filter revenue scan (Q6)"
    ),
    "tpch_q1_pricing_summary": QuerySpec(
        "tpch_q1_pricing_summary", _q1, _TPCH_Q1_ORACLE, "pricing summary (agg battery)"
    ),
    "tpch_q3_shipping_priority": QuerySpec(
        "tpch_q3_shipping_priority", _q3, _TPCH_Q3_ORACLE, "3-way join + top-k"
    ),
    "tpch_q5_regional_revenue": QuerySpec(
        "tpch_q5_regional_revenue", _q5, _TPCH_Q5_ORACLE, "broadcast dim-chain join"
    ),
    "top_supplier_per_nation": QuerySpec(
        "top_supplier_per_nation", _top_supplier, _TOP_SUPPLIER_ORACLE, "rank window"
    ),
    "order_priority_semi_join": QuerySpec(
        "order_priority_semi_join", _order_priority, _ORDER_PRIORITY_ORACLE, "EXISTS semi join"
    ),
    "customers_without_orders_anti_join": QuerySpec(
        "customers_without_orders_anti_join",
        _cust_no_orders,
        _CUST_NO_ORDERS_ORACLE,
        "NOT EXISTS anti join",
    ),
    "customer_order_counts_left_join": QuerySpec(
        "customer_order_counts_left_join",
        _cust_left_join,
        _CUST_LEFT_JOIN_ORACLE,
        "literal LEFT OUTER join + COALESCE (J1 form)",
    ),
    "order_items_right_join": QuerySpec(
        "order_items_right_join",
        _orders_right_join,
        _ORDERS_RIGHT_JOIN_ORACLE,
        "aggregate RIGHT OUTER aggregate + COALESCE (J2 form)",
    ),
}
