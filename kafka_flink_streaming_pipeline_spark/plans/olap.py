"""OLAP plan shapes beyond the reference's flat GROUP BYs.

The reference's analysis catalogue (`analysis/flink-analysis.sql`,
SURVEY.md §2.11) is all single-level GROUP BY + window rank. A user
moving a warehouse workload onto this engine immediately needs the
next ring of relational shapes — multi-level aggregation (ROLLUP /
CUBE / GROUPING SETS), pivoted cross-tabs, exact percentiles, the
full analytic-window family, and the classic decision-support join
patterns (TPC-H Q12/Q13/Q14/Q18/Q19/Q22 adapted to the driver's
schema). Each is expressed declaratively so Catalyst plans it:
partial (map-side) aggregation for every grouping set, broadcast for
every dimension, pushdown for every band predicate.

Determinism rules (see BASELINE.md / driver contract): money sums go
through DECIMAL(18,2) so distributed partial sums are exact and
engine-independent; doubles appear only as a single division of exact
sums or as value copies; every LIMIT/rank frontier carries an explicit
unique tiebreak; grouped NULLs from rollup/cube are coalesced to
sentinel labels so hashing never sees engine-specific NULL encodings.

Scale notes:
- ROLLUP/CUBE in Spark compile to a single Expand + two-phase hash
  aggregate — one shuffle for all grouping sets, not one per level.
- The pivot enumerates its value list explicitly: at 100 TB an
  implicit pivot first runs a distinct-values job over the fact table;
  a declared list skips that scan entirely.
- Q19's OR-of-ANDs band predicate stays a Catalyst filter (pushed to
  the scan where parquet can evaluate it), with the tiny `part` side
  broadcast — the fact table is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import (
    load_table,
    load_table_parallel,
)


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(18,2)")


# --- ROLLUP: revenue by region -> nation -> grand total -------------------


def _rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ supplier ⋈ nation ⋈ region (all dims broadcast), then
    ROLLUP(r_name, n_name): per-nation, per-region subtotal, and grand
    total in ONE shuffle (Expand + two-phase agg). NULL group keys from
    the rollup are coalesced to 'ALL' so both engines hash identical
    strings; grouping_id disambiguates levels."""
    # map-side CPU (3 broadcast joins + decimal + Expand x3) dominates
    # the scan: restore split parallelism (r13; see load_table_parallel)
    li = load_table_parallel(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("line_count"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "gid",
            "revenue",
            "line_count",
        )
        .orderBy("gid", "r_name", "n_name")
    )


_ROLLUP_REVENUE_ORACLE = """
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(n_name, 'ALL') AS n_name,
       GROUPING(r_name, n_name) AS gid,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS line_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY gid, r_name, n_name
"""


# --- CUBE: order counts across status x priority --------------------------


def _cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(o_orderstatus, o_orderpriority): all four grouping sets of
    the 2-D cross-tab in one Expand pass — count plus exact decimal
    total-price sum per cell."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "gid",
            "order_count",
            "total_price",
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_CUBE_ORDERS_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS order_count,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# --- PIVOT: priority cross-tab per order status ---------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


def _pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot cross-tab with a declared value list, lowered to map-side
    conditional aggregation. Two pitfalls of the naive API at scale:
    `df.pivot(col)` without values first runs a distinct-values job
    over the whole fact table, and even WITH declared values Spark's
    `pivot()` compiles to a double shuffle (pre-aggregate on
    (status, priority), then a pivotfirst re-aggregate — visible in
    `.explain`). A declared-list pivot is just N conditional counts,
    which partial-aggregates map-side and shuffles ONCE."""
    orders = load_table(spark, sf_dir, "orders")
    cells = [
        F.count(F.when(F.col("o_orderpriority") == p, 1)).alias(a)
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
    ]
    return orders.groupBy("o_orderstatus").agg(*cells).orderBy("o_orderstatus")


_PIVOT_ORDERS_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- exact percentiles (discrete + median) per priority -------------------


def _percentiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 pick actual data values —
    no interpolation, so cross-engine equality is trivial) plus the
    interpolated median (avg of two middles: one exact-rational double
    op, identical in both engines). Exact percentiles sort within each
    group — fine per-group at any SF because groups are bounded here;
    the unbounded-cardinality path is approx_percentile (see
    `fp_active_users_5m_approx` for the approx-variant pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50_disc"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90_disc"),
            F.expr(
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p99_disc"),
            F.median("o_totalprice").alias("median_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


_PERCENTILES_ORDERS_ORACLE = """
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5)  AS p50_disc,
       quantile_disc(o_totalprice, 0.9)  AS p90_disc,
       quantile_disc(o_totalprice, 0.99) AS p99_disc,
       median(o_totalprice)              AS median_price,
       min(o_totalprice)                 AS min_price,
       max(o_totalprice)                 AS max_price,
       count(*)                          AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- analytic window family: ntile / percent_rank / cume_dist / lead ------


def _window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic-window family over one deterministic frame:
    customers per market segment ordered by (acctbal, custkey) — the
    unique tiebreak makes every rank/ntile/lead assignment
    deterministic. percent_rank = (rank-1)/(n-1) and cume_dist = k/n
    are exact-rational doubles, identical across engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("balance_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.lead("c_acctbal", 1).over(w).alias("next_bal"),
            F.lag("c_acctbal", 1).over(w).alias("prev_bal"),
        )
        .filter(F.col("balance_quartile") == 4)
        .orderBy("c_mktsegment", F.desc("c_acctbal"), F.desc("c_custkey"))
        .limit(50)
    )


_WINDOW_ANALYTICS_ORACLE = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ntile(4)       OVER w AS balance_quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist()    OVER w AS cume,
         lead(c_acctbal, 1) OVER w AS next_bal,
         lag(c_acctbal, 1)  OVER w AS prev_bal
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
) t
WHERE balance_quartile = 4
ORDER BY c_mktsegment, c_acctbal DESC, c_custkey DESC
LIMIT 50
"""


# --- TPC-H Q12 shape: CASE aggregation over a fact-fact join --------------


def _q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape on this schema: lineitem ⋈ orders shuffled on the
    order key, CASE-split counts (urgent+high vs rest) per returnflag.
    The CASE runs map-side inside the partial aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_PRIORITY_MIX_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- TPC-H Q13 shape: outer-join count distribution -----------------------


def _q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: customers LEFT JOIN orders, orders-per-customer, then the
    distribution of those counts. Two cascaded aggregations; the second
    groups on a tiny domain so AQE coalesces its shuffle to a handful
    of partitions."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_DISTRIBUTION_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q14 shape: conditional revenue share ---------------------------


def _q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — both the conditional numerator and
    the denominator are exact decimal sums; the single final division
    is the only double op. `part` broadcasts (tiny at any SF vs
    lineitem)."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(zero)).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


_Q14_PROMO_SHARE_ORACLE = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


# --- TPC-H Q18 shape: HAVING-filtered semi join + top-k -------------------


def _q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 250 (p90 ≈ 180,
    p99 ≈ 263 on the driver data — selective but non-empty at every
    SF). The HAVING aggregate runs FIRST and is tiny; it then drives
    a join back to orders/customer. Quantity sums go through decimal
    so the >250 frontier is exact, not float-order-dependent."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(250).cast("decimal(18,2)"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_LARGE_ORDERS_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2))
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- TPC-H Q19 shape: disjunctive band predicate (OR-of-ANDs) -------------


def _q19_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: three (brand, size-band, quantity-band) disjuncts. The OR
    stays one Catalyst predicate evaluated after the broadcast join
    with `part`; the shared bounds (l_quantity ≤ 40, p_size ≥ 1) are
    what parquet can push. Single-row exact-decimal output."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return joined.filter(band).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count("*").alias("line_count"),
    )


_Q19_BAND_REVENUE_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS line_count
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#5'  AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


# --- TPC-H Q22 shape: scalar-subquery filter + anti join ------------------


def _q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: customers with above-average positive balance and no
    orders. The scalar average is a 1-row aggregate broadcast into the
    filter (J4 pattern); the no-orders test is a left-anti join. The
    average divides an exact decimal sum once; the > comparison is
    against that single double, so the frontier is deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0).agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
        )
    )
    return (
        cust.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_IDLE_BALANCES_ORACLE = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- TPC-H Q2 shape: correlated scalar subquery, decorrelated -------------


def _q2_max_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated scalar subquery (`WHERE x = (SELECT max(..)
    WHERE inner.key = outer.key)`) decorrelated the way Catalyst
    rewrites it: the per-key aggregate is computed once (tiny — one
    row per nation), broadcast, and equi-joined back with the equality
    as a join-side filter. No per-row subquery execution ever happens
    at any scale."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    max_bal = F.broadcast(
        supplier.groupBy(F.col("s_nationkey").alias("mk"))
        .agg(F.max("s_acctbal").alias("max_bal"))
    )
    return (
        supplier.join(max_bal, supplier.s_nationkey == max_bal.mk)
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("n_name", "s_suppkey")
    )


_Q2_MAX_BAL_ORACLE = """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM supplier s JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY n_name, s_suppkey
"""


# --- percent-of-total window (unbounded partition frame) ------------------


def _nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_report: each nation's share of its region's revenue.
    The window is an UNBOUNDED partition aggregate (no ORDER BY) over
    the already-aggregated per-nation rows — 25 rows at any SF, so the
    window stage costs nothing even though lineitem is the fact
    source. Shares divide two exact decimal sums (cast once), so the
    doubles agree across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    per_nation = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).alias("rev"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        det_round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 6
        ).alias("region_share"),
    ).orderBy("r_name", "n_name")


_NATION_SHARE_ORACLE = """
WITH per_nation AS (
  SELECT r_name, n_name,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev AS DOUBLE) AS revenue,
       (floor((CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS region_share
FROM per_nation
ORDER BY r_name, n_name
"""


# --- set operations: INTERSECT / EXCEPT cohorts ---------------------------


def _set_ops_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer cohort algebra across two half-years: INTERSECT and
    EXCEPT (distinct semantics in both engines). Spark plans these as
    aggregate + join — the distinct collapses each side BEFORE the
    set-op join, so the shuffled key sets are already deduplicated."""
    orders = load_table(spark, sf_dir, "orders")

    def half(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        ).select("o_custkey")

    h1 = half("1996-01-01 00:00:00", "1996-07-01 00:00:00")
    h2 = half("1996-07-01 00:00:00", "1997-01-01 00:00:00")

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(F.count("*").alias("customers")).select(
            F.lit(tag).alias("cohort"), "customers"
        )

    return (
        tagged(h1.intersect(h2), "both")
        .unionByName(tagged(h1.subtract(h2), "h1_only"))
        .unionByName(tagged(h2.subtract(h1), "h2_only"))
        .orderBy("cohort")
    )


_SET_OPS_ORACLE = """
WITH h1 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'),
     h2 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
SELECT 'both' AS cohort,
       (SELECT count(*) FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)) AS customers
UNION ALL
SELECT 'h1_only',
       (SELECT count(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2))
UNION ALL
SELECT 'h2_only',
       (SELECT count(*) FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1))
ORDER BY cohort
"""


# --- GROUPING SETS (arbitrary level combinations) -------------------------


def _grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at three hand-picked aggregation levels in ONE pass.

    ROLLUP/CUBE cover the lattice's standard walks; GROUPING SETS picks
    arbitrary members — here (region, nation), (nation), and the grand
    total, i.e. the region-only level is deliberately skipped. Spark
    compiles the declared sets to the same single Expand + two-phase
    aggregate as rollup: one shuffle regardless of how many sets are
    listed. Authored via spark.sql because GROUPING SETS has no
    DataFrame-API equivalent (SURVEY.md §2.4 A3 family).
    """
    from kafka_flink_streaming_pipeline_spark.sources.batch import register_views

    register_views(spark, sf_dir, "region", "nation", "customer", "orders")
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               grouping(r_name) AS g_region,
               grouping(n_name) AS g_nation,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())
        ORDER BY g_region, g_nation, region, nation
        """
    )


_GROUPING_SETS_ORACLE = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       grouping(r_name) AS g_region,
       grouping(n_name) AS g_nation,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())
ORDER BY g_region, g_nation, region, nation
"""


# --- time-RANGE window frame (rolling 30-day revenue) ---------------------

_ROLL_SECS = 30 * 86400


def _rolling_revenue_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 30-day order total via a RANGE frame.

    The time-based sliding aggregate (Flink OVER RANGE INTERVAL,
    SURVEY.md §2.5 family): frame bounds are expressed in SECONDS of
    event time, not row counts, so gaps and bursts are handled
    correctly. RANGE frames include all peer rows of the current
    timestamp — order within a timestamp cannot change the result,
    and the summed quantity is an exact decimal, so the window output
    is deterministic under any partitioning. One shuffle on
    o_custkey; the frame scan is a single ordered pass per partition.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-_ROLL_SECS, 0)
    )
    rolling = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        rolling.cast("double").alias("rolling_30d"),
    )


_ROLLING_30D_ORACLE = f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY epoch(o_orderdate)
         RANGE BETWEEN {_ROLL_SECS} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_30d
FROM orders
"""


# --- array aggregation (ordered collect) ----------------------------------


def _order_dates_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer chronologically-ordered order-date array.

    The collect-to-array aggregation a feature pipeline uses to build
    sequence features (purchase histories, session traces).
    collect_list order is nondeterministic under partitioning, so the
    contract REQUIRES the explicit sort_array — dates are formatted as
    ISO strings first, making lexicographic = chronological and the
    array engine-portable. Arrays stay one row per customer: at 100 TB
    this is the standard groupBy shuffle with list accumulation, and
    per-key array size is bounded by per-customer activity, not corpus
    size.

    The sorted array is emitted as a comma-joined canonical string:
    list cells are unhashable in a pandas-based result canonicalizer
    (the driver's), and the string form is the portable contract both
    engines can hash identically.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.date_format("o_orderdate", "yyyy-MM-dd"))
                ),
                ",",
            ).alias("order_dates"),
            F.count("*").alias("n_orders"),
        )
    )


_ORDER_DATES_ARRAY_ORACLE = """
SELECT o_custkey,
       array_to_string(
         list(strftime(o_orderdate, '%Y-%m-%d')
              ORDER BY strftime(o_orderdate, '%Y-%m-%d')), ',') AS order_dates,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


# --- banded range join ------------------------------------------------------

_TIERS = [
    (0, 0, 25_000),
    (1, 25_000, 75_000),
    (2, 75_000, 150_000),
    (3, 150_000, 300_000),
    (4, 300_000, 600_000),
]
_BANDW = 25_000


def _range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-membership) join via BANDING: the tier dimension
    has variable-width [lo, hi) intervals, so a naive `price BETWEEN lo
    AND hi` join is a nested-loop theta join — O(|fact|·|dim|) and
    unpartitionable. Banding fixes it: explode each interval into the
    fixed-width buckets it overlaps, bucket the fact side with the same
    width, EQUI-join on bucket, and re-check the exact bounds as a
    residual filter. The join is now hash-partitionable on the bucket
    key (broadcastable here because the expanded dim is 24 rows; with a
    million intervals the same plan shuffle-partitions) — each fact row
    is examined against only the intervals sharing its bucket, never
    the whole dimension. The standard time/range-interval join strategy
    (cf. interval_join.py for the streaming/time variant)."""
    o = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(_TIERS, "tier_id INT, lo BIGINT, hi BIGINT")
    expanded = tiers.select(
        "tier_id",
        "lo",
        "hi",
        F.explode(F.expr(f"sequence(lo div {_BANDW}, (hi - 1) div {_BANDW})")).alias(
            "bucket"
        ),
    )
    fact = o.select(
        F.col("o_totalprice").alias("price"),
        F.floor(F.col("o_totalprice") / _BANDW).cast("long").alias("bucket"),
    )
    return (
        fact.join(F.broadcast(expanded), "bucket")
        .filter((F.col("price") >= F.col("lo")) & (F.col("price") < F.col("hi")))
        .groupBy("tier_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .orderBy("tier_id")
    )


_RANGE_BAND_ORACLE = f"""
WITH tiers(tier_id, lo, hi) AS (
  VALUES {", ".join(f"({t}, {lo}, {hi})" for t, lo, hi in _TIERS)}
)
SELECT tier_id, lo, hi,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier_id, lo, hi
ORDER BY tier_id
"""


QUERIES: dict[str, QuerySpec] = {
    "range_band_join_tiers": QuerySpec(
        "range_band_join_tiers",
        _range_band_join,
        _RANGE_BAND_ORACLE,
        "variable-width interval join lowered to bucket equi-join + residual filter",
    ),
    "customer_order_dates_array": QuerySpec(
        "customer_order_dates_array",
        _order_dates_array,
        _ORDER_DATES_ARRAY_ORACLE,
        "ordered collect_list array aggregation",
    ),
    "grouping_sets_revenue": QuerySpec(
        "grouping_sets_revenue",
        _grouping_sets_revenue,
        _GROUPING_SETS_ORACLE,
        "arbitrary grouping-set lattice in one Expand",
    ),
    "rolling_revenue_30d": QuerySpec(
        "rolling_revenue_30d",
        _rolling_revenue_30d,
        _ROLLING_30D_ORACLE,
        "time-RANGE window frame (rolling 30-day sum)",
    ),
    "tpch_q2_max_balance_supplier": QuerySpec(
        "tpch_q2_max_balance_supplier",
        _q2_max_balance_supplier,
        _Q2_MAX_BAL_ORACLE,
        "correlated scalar subquery, decorrelated (Q2)",
    ),
    "nation_revenue_share": QuerySpec(
        "nation_revenue_share",
        _nation_revenue_share,
        _NATION_SHARE_ORACLE,
        "percent-of-total via unbounded partition window",
    ),
    "set_ops_customer_cohorts": QuerySpec(
        "set_ops_customer_cohorts",
        _set_ops_cohorts,
        _SET_OPS_ORACLE,
        "INTERSECT / EXCEPT cohort algebra",
    ),
    "rollup_revenue_region_nation": QuerySpec(
        "rollup_revenue_region_nation",
        _rollup_revenue,
        _ROLLUP_REVENUE_ORACLE,
        "ROLLUP region→nation→total in one Expand pass",
    ),
    "cube_order_status_priority": QuerySpec(
        "cube_order_status_priority",
        _cube_orders,
        _CUBE_ORDERS_ORACLE,
        "CUBE over status × priority",
    ),
    "pivot_priority_by_status": QuerySpec(
        "pivot_priority_by_status",
        _pivot_orders,
        _PIVOT_ORDERS_ORACLE,
        "pivot cross-tab with declared value list",
    ),
    "percentiles_order_totals": QuerySpec(
        "percentiles_order_totals",
        _percentiles_orders,
        _PERCENTILES_ORDERS_ORACLE,
        "exact discrete percentiles + median per group",
    ),
    "window_analytics_suite": QuerySpec(
        "window_analytics_suite",
        _window_analytics,
        _WINDOW_ANALYTICS_ORACLE,
        "ntile/percent_rank/cume_dist/lead/lag family",
    ),
    "tpch_q12_priority_mix": QuerySpec(
        "tpch_q12_priority_mix",
        _q12_priority_mix,
        _Q12_PRIORITY_MIX_ORACLE,
        "CASE-split counts over fact-fact join (Q12)",
    ),
    "tpch_q13_order_distribution": QuerySpec(
        "tpch_q13_order_distribution",
        _q13_distribution,
        _Q13_DISTRIBUTION_ORACLE,
        "outer-join count distribution (Q13)",
    ),
    "tpch_q14_promo_share": QuerySpec(
        "tpch_q14_promo_share",
        _q14_promo_share,
        _Q14_PROMO_SHARE_ORACLE,
        "conditional revenue share (Q14)",
    ),
    "tpch_q18_large_orders": QuerySpec(
        "tpch_q18_large_orders",
        _q18_large_orders,
        _Q18_LARGE_ORDERS_ORACLE,
        "HAVING-driven join-back top-k (Q18)",
    ),
    "tpch_q19_band_revenue": QuerySpec(
        "tpch_q19_band_revenue",
        _q19_band_revenue,
        _Q19_BAND_REVENUE_ORACLE,
        "disjunctive band predicate (Q19)",
    ),
    "tpch_q22_idle_balances": QuerySpec(
        "tpch_q22_idle_balances",
        _q22_idle_balances,
        _Q22_IDLE_BALANCES_ORACLE,
        "scalar-subquery filter + anti join (Q22)",
    ),
}
