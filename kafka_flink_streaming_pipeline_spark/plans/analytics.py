"""Behavioral analytics shapes: ordered funnels, melt/unpivot, ordered LISTAGG.

The reference's analysis catalogue stops at sessionization and D0-D7
retention (`analysis/flink-analysis.sql:94-152,210-230`); the next
questions a clickstream analyst asks are *ordered funnels* ("of the
users who signed up, how many then viewed, then clicked, then
purchased — in that order?"), long-form reshaping for BI tools
(UNPIVOT/melt), and ordered string aggregation for report rows. None
of these exist in the reference; they complete the analytics surface
the same way the OLAP module completes the warehouse surface.

Determinism rules (driver contract): ordered-concat outputs fix their
order with an explicit rank inside the aggregation (collect order is
partition-dependent; the sort makes it a contract); money sums go
through DECIMAL(18,2); every presentational ORDER BY carries a unique
key.

Scale notes:
- The funnel's four step-aggregations all hash-partition on
  `user_id`; at 100 TB each level's input is the (shrinking) set of
  users who survived the previous step, and the per-step join is a
  co-partitioned equi-join — no broadcast of user-cardinality data,
  no skew (one row per user per level).
- UNPIVOT compiles to a map-side Expand (1 row → k rows) feeding a
  partial aggregate: the exchange carries |groups|×k rows, never
  |fact|×k.
- The ordered LISTAGG caps each group with a rank-window top-N BEFORE
  collecting, so the collected arrays are bounded (top-5) no matter
  how large a group grows — an unbounded collect_list is a driver OOM
  at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table


# --- ordered funnel: signup -> view -> click -> purchase ------------------


def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 4-step funnel over `events`. Step k's timestamp
    is the FIRST event of that type strictly after the user's step-k-1
    timestamp (the standard funnel semantics; a plain per-type min()
    would count view-before-signup users as converted). Each level is
    filter → co-partitioned join on user_id → min() — the sequential
    dependency is inherent to the semantics, but every stage keys on
    user_id so the shuffle layout is reused, and each level's input
    shrinks to the survivors of the previous one."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def step(prev: DataFrame, prev_col: str, event_type: str, out_col: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .join(prev.select("user_id", prev_col), "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = step(t1, "t1", "view", "t2")
    t3 = step(t2, "t2", "click", "t3")
    t4 = step(t3, "t3", "purchase", "t4")
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .join(t4, "user_id", "left")
        .agg(
            F.count("t1").alias("users_signup"),
            F.count("t2").alias("users_view"),
            F.count("t3").alias("users_click"),
            F.count("t4").alias("users_purchase"),
        )
    )


_FUNNEL_ORACLE = """
WITH e AS (SELECT user_id, event_type, ts FROM events),
t1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN t1 USING (user_id)
       WHERE event_type = 'view' AND ts > t1 GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN t2 USING (user_id)
       WHERE event_type = 'click' AND ts > t2 GROUP BY e.user_id),
t4 AS (SELECT e.user_id, min(ts) AS t4 FROM e JOIN t3 USING (user_id)
       WHERE event_type = 'purchase' AND ts > t3 GROUP BY e.user_id)
SELECT count(t1.t1) AS users_signup,
       count(t2.t2) AS users_view,
       count(t3.t3) AS users_click,
       count(t4.t4) AS users_purchase
FROM t1
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
LEFT JOIN t4 USING (user_id)
"""


# --- UNPIVOT / melt: wide price components -> long form -------------------


def _unpivot_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the three lineitem price components into long form, then
    aggregate per (returnflag, component). The unpivot is a map-side
    Expand (1 row → 3), and the partial aggregate collapses each
    partition to |groups|×3 rows before the single shuffle — the fact
    table is never shuffled wide. DECIMAL(18,2) partial sums keep the
    distributed total exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("discount"),
        F.col("l_tax").cast("decimal(18,2)").alias("tax"),
    )
    long_form = li.unpivot(
        ["l_returnflag"], ["extendedprice", "discount", "tax"], "component", "amount"
    )
    return (
        long_form.groupBy("l_returnflag", "component")
        .agg(
            F.sum("amount").cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "component")
    )


_UNPIVOT_ORACLE = """
WITH long_form AS (
  SELECT l_returnflag, 'extendedprice' AS component,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS amount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
)
SELECT l_returnflag, component, CAST(sum(amount) AS DOUBLE) AS total, count(*) AS n
FROM long_form
GROUP BY l_returnflag, component
ORDER BY l_returnflag, component
"""


# --- ordered LISTAGG: top-5 customers per nation, rank-ordered concat -----


def _listagg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-ordered string aggregation (LISTAGG/string_agg analogue):
    top-5 customers per nation by account balance, concatenated in rank
    order. The rank-window top-N bounds every group to 5 rows BEFORE
    collect_list, and the collected structs are array_sort-ed by rank —
    collect order is partition-dependent, the explicit sort is what
    makes the concat deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    top5 = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return (
        top5.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                    lambda s: s.c_name,
                ),
                ",",
            ).alias("top_names"),
            F.count("*").alias("n"),
        )
        .orderBy("c_nationkey")
    )


_LISTAGG_ORACLE = """
WITH ranked AS (
  SELECT c_nationkey, c_name,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY rn) AS top_names,
       count(*) AS n
FROM ranked
WHERE rn <= 5
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- semi-structured extraction: VARIANT over JSON props ------------------


def _props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the `props` JSON column via
    Spark's VARIANT type (`parse_json` → `variant_get`): parse once
    into the shredded binary encoding, extract typed paths without
    re-parsing — the scale path for ragged JSON where a declared
    `from_json` schema (F17, used in the Kafka sources) can't cover
    every key. The extraction is a map-side expression; the aggregate
    is the usual two-phase hash agg."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_PROPS_VARIANT_ORACLE = """
WITH x AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events
)
SELECT event_type, count(*) AS n, count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


# --- next-event transition matrix (Markov path analysis) ------------------


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    LEAD(event_type) over (user_id, time) pairs each event with its
    successor; the transition share divides each pair count by the
    from-state's total — exact integer counts, divided once, rounded.
    The window partitions by user_id (bounded partitions — never a
    global sort), and the two aggregations reuse the same hash layout.
    The reference's sessionization (`analysis/flink-analysis.sql:94-152`)
    asks "how long do users stay"; this asks "where do they go next"."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        det_round(F.col("n") / F.sum("n").over(w_from), 4).alias("share"),
    ).orderBy("from_type", "to_type")


_TRANSITIONS_ORACLE = """
WITH pairs AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       (floor((n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS share
FROM counts
ORDER BY from_type, to_type
"""


# --- fixed-iteration PageRank over the event-transition graph --------------

_PR_DAMPING = 0.85
_PR_ITERS = 3


def _pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 fixed iterations, d=0.85) over the
    event-type transition graph from `event_transition_matrix`: nodes =
    event types, edge weight = observed transition probability. The
    iterative structure every link-analysis / influence-propagation job
    needs, expressed as UNROLLED declarative plans: each iteration is a
    co-partitioned rank⋈edges join + groupBy(dst) — Catalyst sees one
    DAG, reuses the edge exchange across iterations, and nothing ever
    touches the driver (node count enters as a broadcast 1-row
    aggregate, not a collected scalar). At 100 TB the per-iteration
    shuffle carries |edges| rows keyed by node — the textbook
    distributed formulation (Page et al. 1999; Malewicz et al., Pregel,
    SIGMOD'10). Dangling mass is not redistributed (documented; oracle
    identical). Round-4 output contract like the transition shares."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    weights = pairs.groupBy("src", "dst").agg(F.count("*").alias("w"))
    out_tot = weights.groupBy("src").agg(F.sum("w").alias("tot"))
    edges = weights.join(out_tot, "src").select(
        "src", "dst", (F.col("w") / F.col("tot")).alias("p")
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1.0 - _PR_DAMPING) / F.col("n_nodes")
                    + F.lit(_PR_DAMPING) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", det_round(F.col("rank"), 4).alias("rank")).orderBy("node")


def _pagerank_oracle() -> str:
    d = _PR_DAMPING
    iters = "\n".join(
        f"""r{k} AS (
  SELECT nodes.node, {1.0 - d} / nn.n_nodes + {d} * coalesce(c.s, 0) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT e.dst, sum(r.rank * e.p) AS s
             FROM r{k - 1} r JOIN edges e ON r.node = e.src
             GROUP BY e.dst) c ON nodes.node = c.dst
),"""
        for k in range(1, _PR_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
weights AS (
  SELECT src, dst, count(*) AS w FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
),
edges AS (
  SELECT w.src, w.dst, w.w / CAST(t.tot AS DOUBLE) AS p
  FROM weights w JOIN (SELECT src, sum(w) AS tot FROM weights GROUP BY src) t USING (src)
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
r0 AS (SELECT node, 1.0 / n_nodes AS rank FROM nodes CROSS JOIN nn),
{iters}
final AS (SELECT node, rank FROM r{_PR_ITERS})
SELECT node, (floor((rank) * 10000.0 + 0.5) / 10000.0) AS rank FROM final ORDER BY node
"""


# --- RFM customer segmentation ---------------------------------------------


def _rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary segmentation — the classic customer
    scoring every analytics stack ships, built scale-correct: quartile
    THRESHOLDS come from one `percentile_disc` aggregate broadcast back
    over the per-customer frame (9 scalars), NOT from `ntile() OVER ()`
    whose empty-partition window would serialize the whole table
    through one task. Monetary sums in exact decimal and casts to
    double once (partition-order-proof); recency is integer days vs
    the corpus max date (the J4 broadcast-scalar pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("max_d"))
    rfm = per.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff("max_d", "last_order").alias("recency_days"),
        "frequency",
        "monetary",
    )
    th = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"{c[0]}{int(p * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for p in (0.25, 0.5, 0.75)
        ]
    )
    scored = rfm.crossJoin(F.broadcast(th))
    r_score = (
        F.when(F.col("recency_days") <= F.col("r25"), 4)
        .when(F.col("recency_days") <= F.col("r50"), 3)
        .when(F.col("recency_days") <= F.col("r75"), 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") >= F.col("f75"), 4)
        .when(F.col("frequency") >= F.col("f50"), 3)
        .when(F.col("frequency") >= F.col("f25"), 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("monetary") >= F.col("m75"), 4)
        .when(F.col("monetary") >= F.col("m50"), 3)
        .when(F.col("monetary") >= F.col("m25"), 2)
        .otherwise(1)
    )
    segment = (
        F.when((r_score == 4) & (f_score >= 3), "champion")
        .when((r_score >= 3) & (f_score >= 3), "loyal")
        .when(r_score >= 3, "recent")
        .when(f_score >= 3, "at_risk")
        .otherwise("hibernating")
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        segment.alias("segment"),
    )  # one row per customer: corpus-sized, unsorted


_RFM_ORACLE = """
WITH per AS (
  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT max(o_orderdate) AS max_d FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', CAST(last_order AS DATE), CAST(max_d AS DATE))
           AS recency_days,
         frequency, monetary
  FROM per CROSS JOIN mx
),
th AS (
  SELECT quantile_disc(recency_days, 0.25) AS r25,
         quantile_disc(recency_days, 0.5)  AS r50,
         quantile_disc(recency_days, 0.75) AS r75,
         quantile_disc(frequency, 0.25) AS f25,
         quantile_disc(frequency, 0.5)  AS f50,
         quantile_disc(frequency, 0.75) AS f75,
         quantile_disc(monetary, 0.25) AS m25,
         quantile_disc(monetary, 0.5)  AS m50,
         quantile_disc(monetary, 0.75) AS m75
  FROM rfm
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CASE WHEN recency_days <= r25 THEN 4 WHEN recency_days <= r50 THEN 3
              WHEN recency_days <= r75 THEN 2 ELSE 1 END AS r_score,
         CASE WHEN frequency >= f75 THEN 4 WHEN frequency >= f50 THEN 3
              WHEN frequency >= f25 THEN 2 ELSE 1 END AS f_score,
         CASE WHEN monetary >= m75 THEN 4 WHEN monetary >= m50 THEN 3
              WHEN monetary >= m25 THEN 2 ELSE 1 END AS m_score
  FROM rfm CROSS JOIN th
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score = 4 AND f_score >= 3 THEN 'champion'
            WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
            WHEN r_score >= 3 THEN 'recent'
            WHEN f_score >= 3 THEN 'at_risk'
            ELSE 'hibernating' END AS segment
FROM scored
"""


# --- weekly cohort retention matrix ----------------------------------------


def _cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cohort retention MATRIX — the generalization of Q9's
    single D0→D7 number: users grouped by first-seen week, each cohort
    tracked across week offsets, cell = share of the cohort active in
    that week. Week boundaries are PURE INTEGER epoch-week arithmetic
    (floor(days-since-1970 / 7)) — calendar week-truncation semantics
    (ISO vs locale Monday/Sunday) differ across engines, and an
    off-by-one week boundary silently shifts whole cohorts. Offsets
    are calendar-week offsets (epoch_week(d) − epoch_week(d0)) — the
    textbook weekly-cohort definition; cohort assignment is identical
    to a min-day formulation because floor is monotone.

    Plan shape (r10: everything after the scan is at USER-WEEK grain —
    the r9 100x run measured 31x for 100x data because activity was
    carried per user-DAY through the join and a second distinct):
    distinct (user, epoch_week) is the ONLY corpus-grain shuffle;
    first-seen is one groupBy(user) min over it; the join back is
    user-week × 1 row and its (cohort, offset) projection is already
    distinct at this grain, so the matrix is a single groupBy — no
    second distinct exists to pay for. Cohort sizes are a tiny
    relation broadcast back. No window functions at all."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    act = ev.select(
        "user_id", F.floor(F.datediff(F.to_date("ts"), epoch) / 7).alias("w")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    cells = (
        act.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format(
                F.date_add(epoch, (F.col("cohort_week") * 7).cast("int")), "yyyy-MM-dd"
            ).alias("cohort_week_start"),
            "week_offset",
            "cohort_size",
            "active_users",
            det_round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week_start", "week_offset")
    )


_COHORT_MATRIX_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
  FROM events
),
first AS (
  SELECT user_id, min(w) AS cohort_week FROM act GROUP BY user_id
),
sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first
          GROUP BY cohort_week),
cells AS (
  SELECT f.cohort_week, a.w - f.cohort_week AS week_offset,
         count(*) AS active_users
  FROM act a JOIN first f USING (user_id)
  GROUP BY f.cohort_week, a.w - f.cohort_week
)
SELECT strftime(DATE '1970-01-01' + INTERVAL (ce.cohort_week * 7) DAY,
                '%Y-%m-%d') AS cohort_week_start,
       ce.week_offset, s.cohort_size, ce.active_users,
       (floor((ce.active_users / CAST(s.cohort_size AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS retention
FROM cells ce JOIN sizes s USING (cohort_week)
ORDER BY cohort_week_start, week_offset
"""


QUERIES: dict[str, QuerySpec] = {
    "cohort_retention_matrix": QuerySpec(
        "cohort_retention_matrix",
        _cohort_retention_matrix,
        _COHORT_MATRIX_ORACLE,
        "weekly cohort retention matrix (epoch-week integer arithmetic)",
    ),
    "rfm_customer_segments": QuerySpec(
        "rfm_customer_segments",
        _rfm_segments,
        _RFM_ORACLE,
        "RFM segmentation: broadcast quartile thresholds, no global ntile window",
    ),
    "pagerank_event_graph": QuerySpec(
        "pagerank_event_graph",
        _pagerank_event_graph,
        _pagerank_oracle(),
        "weighted PageRank, 3 unrolled iterations over the transition graph",
    ),
    "event_transition_matrix": QuerySpec(
        "event_transition_matrix",
        _event_transitions,
        _TRANSITIONS_ORACLE,
        "first-order Markov next-event transitions with per-from-state shares",
    ),
    "events_props_variant": QuerySpec(
        "events_props_variant",
        _props_variant,
        _PROPS_VARIANT_ORACLE,
        "VARIANT semi-structured extraction: parse_json once, typed variant_get paths",
    ),
    "funnel_ordered_4step": QuerySpec(
        "funnel_ordered_4step",
        _funnel,
        _FUNNEL_ORACLE,
        "strictly-ordered signup→view→click→purchase funnel, co-partitioned per-step joins",
    ),
    "unpivot_price_components": QuerySpec(
        "unpivot_price_components",
        _unpivot_components,
        _UNPIVOT_ORACLE,
        "UNPIVOT/melt to long form + exact-decimal component totals",
    ),
    "listagg_top_customers": QuerySpec(
        "listagg_top_customers",
        _listagg_top_customers,
        _LISTAGG_ORACLE,
        "rank-ordered string_agg with bounded (top-5) groups",
    ),
}
