"""Data-profiling and changelog-compaction shapes.

The reference monitors its pipeline observationally (Prometheus rates,
`README.md:79-86`) and trusts its data blindly — there is no profiling
surface at all. A 100 TB ingest needs one: distribution histograms,
one-pass column profiles (null rates / distinct counts / ranges), and
changelog compaction (the batch twin of the streaming upsert sink in
`streaming/upsert.py`, which replicates the reference's PK-upsert JDBC
sink `flink-jobs/events_postgres_sink.sql:37-57`).

Scale notes:
- The histogram is floor-bucketing + groupBy: map-side partial agg
  collapses each partition to |buckets| rows before the one shuffle.
- The profile is ONE aggregate pass over the table — every metric
  (counts, null counts, distinct counts, min/max) rides the same
  two-phase hash aggregate; no per-column scans. Exact distinct counts
  shuffle by value under the hood; at unbounded cardinality swap in
  approx_count_distinct (documented deviation, same plan shape).
- Changelog compaction is the classic rank-1-per-key: one shuffle on
  the key, WindowGroupLimit prunes non-latest rows before the final
  filter at the exchange boundary, so state never materializes the
  full history per key downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"
_BUCKET_W = 20000.0


# --- equi-width histogram --------------------------------------------------


def _histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: floor-bucket + count +
    per-bucket min/max (the range check doubles as a bucket-boundary
    audit). Bucketing is a map-side expression; the shuffle carries
    |buckets| partial rows per partition."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(_BUCKET_W)).alias("bucket")
    return (
        o.groupBy(bucket)
        .agg(
            F.count("*").alias("n"),
            det_round(F.min("o_totalprice"), 2).alias("lo"),
            det_round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


_HISTOGRAM_ORACLE = f"""
SELECT CAST(floor(o_totalprice / {_BUCKET_W}) AS BIGINT) AS bucket,
       count(*) AS n,
       (floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0) AS lo,
       (floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0) AS hi
FROM orders
GROUP BY 1
ORDER BY bucket
"""


# --- one-pass column profile ----------------------------------------------


def _profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile: row count, per-column null counts,
    distinct counts, and ranges — the scan-once data-quality snapshot
    run after every ingest. All metrics share a single two-phase
    aggregate; nothing scans the table twice."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        (F.count("*") - F.count("o_orderdate")).alias("null_orderdate"),
        F.count_distinct("o_custkey").alias("distinct_custkey"),
        F.count_distinct("o_orderstatus").alias("distinct_status"),
        F.count_distinct("o_orderpriority").alias("distinct_priority"),
        F.date_format(F.min("o_orderdate"), TS_FMT).alias("min_orderdate"),
        F.date_format(F.max("o_orderdate"), TS_FMT).alias("max_orderdate"),
        det_round(F.min("o_totalprice"), 2).alias("min_total"),
        det_round(F.max("o_totalprice"), 2).alias("max_total"),
    )


_PROFILE_ORACLE = """
SELECT count(*) AS n_rows,
       count(*) - count(o_custkey) AS null_custkey,
       count(*) - count(o_orderdate) AS null_orderdate,
       count(DISTINCT o_custkey) AS distinct_custkey,
       count(DISTINCT o_orderstatus) AS distinct_status,
       count(DISTINCT o_orderpriority) AS distinct_priority,
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_orderdate,
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_orderdate,
       (floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0) AS min_total,
       (floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0) AS max_total
FROM orders
"""


# --- changelog compaction (CDC latest-state) ------------------------------


def _cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: treat `events` as a keyed change stream and
    materialize the latest state per user — rank-1-per-key with a total
    order (ts DESC, event_id DESC tiebreak for same-timestamp deliveries).
    The batch twin of the streaming MERGE upsert's dedupe-latest step
    (`streaming/upsert.py`); Spark plans a WindowGroupLimit below the
    rank filter, so each shuffle partition retains one row per key
    instead of the key's full history."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            det_round(F.col("value"), 4).alias("last_value"),
            F.date_format("ts", TS_FMT).alias("last_ts"),
        )
    )  # unsorted: one row per key, key-partitioned — no global sort at scale


_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_type,
       (floor((value) * 10000.0 + 0.5) / 10000.0) AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM ranked
WHERE rn = 1
"""


# --- time-series gap fill (densification) ---------------------------------


def _gapfill_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-minute event counts: the dense minute spine is
    GENERATED from the 1-row min/max aggregate (`explode(sequence(...))`
    — never materialized as input), the fact side is aggregated to
    per-minute counts BEFORE joining, and missing minutes coalesce to
    zero. The densification every monitoring chart needs (the
    reference's Q1 events-per-minute silently drops empty minutes —
    `analysis/flink-analysis.sql:9-23`). At 100 TB the spine is |span|
    rows and the join is spine-vs-|span| aggregates — the raw fact
    table never meets the generator."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("lo"),
        F.date_trunc("minute", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))).alias("minute")
    )
    counts = ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.join(counts, "minute", "left")
        .select(
            F.date_format("minute", TS_FMT).alias("minute_ts"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("minute_ts")
    )


_GAPFILL_ORACLE = """
WITH b AS (
  SELECT date_trunc('minute', min(ts)) AS lo, date_trunc('minute', max(ts)) AS hi
  FROM events
),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 minute')) AS minute FROM b),
counts AS (SELECT date_trunc('minute', ts) AS minute, count(*) AS n FROM events GROUP BY 1)
SELECT strftime(spine.minute, '%Y-%m-%d %H:%M:%S') AS minute_ts,
       coalesce(n, 0) AS n
FROM spine LEFT JOIN counts USING (minute)
ORDER BY minute_ts
"""


# --- key-skew profiler -----------------------------------------------------


def _key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the diagnostic run BEFORE choosing a
    join strategy at scale: per-key cardinalities reduced to one row of
    distribution stats (max/p99/p50, hot-key share, skew factor =
    max/mean). Two aggregations: the first shuffles |keys| partials,
    the second reduces |keys| rows to 1. When skew_factor is high, the
    plans switch to salting (`operators/skew.py`) or AQE skew-split
    (`test_aqe_splits_skewed_join_partitions`)."""
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_key_rows"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").cast("long").alias("p50"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)").cast("long").alias("p99"),
        det_round(F.max("n") / F.sum("n"), 6).alias("hot_key_share"),
        det_round(F.max("n") * F.count("*") / F.sum("n"), 4).alias("skew_factor"),
    )


_KEY_SKEW_ORACLE = """
WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
SELECT count(*) AS n_keys,
       CAST(sum(n) AS BIGINT) AS total_rows,
       max(n) AS max_key_rows,
       CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
       (floor((max(n) / CAST(sum(n) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS hot_key_share,
       (floor((max(n) * count(*) / CAST(sum(n) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS skew_factor
FROM c
"""


# --- equi-depth histogram ---------------------------------------------------


def _equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-boundary) histogram of order totals: the
    quartile boundaries come from ONE 1-row percentile aggregate that is
    broadcast back onto the fact scan; bucket assignment is then a
    map-side CASE, and the final count is a |buckets|-row shuffle. The
    complement of the equi-width histogram above — equal POPULATION per
    bucket instead of equal width. At 100 TB the boundary aggregate is
    the only full-data pass before the (tiny) bucket agg; for unbounded
    inputs swap percentile_disc for approx_percentile (same plan shape,
    documented deviation)."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)").alias(name)
            for q, name in ((0.25, "q1"), (0.5, "q2"), (0.75, "q3"))
        ]
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 0)
        .when(F.col("o_totalprice") <= F.col("q2"), 1)
        .when(F.col("o_totalprice") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket)
        .agg(
            F.count("*").alias("n"),
            det_round(F.min("o_totalprice"), 2).alias("lo"),
            det_round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


_EQUIDEPTH_ORACLE = """
WITH b AS (
  SELECT quantile_disc(o_totalprice, 0.25) AS q1,
         quantile_disc(o_totalprice, 0.5)  AS q2,
         quantile_disc(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT CAST(CASE WHEN o_totalprice <= q1 THEN 0
            WHEN o_totalprice <= q2 THEN 1
            WHEN o_totalprice <= q3 THEN 2
            ELSE 3 END AS INTEGER) AS bucket,
       count(*) AS n,
       (floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0) AS lo,
       (floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0) AS hi
FROM orders, b
GROUP BY 1
ORDER BY bucket
"""


# --- robust anomaly detection (median / MAD) --------------------------------


def _anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detector over the ingest: hourly event
    counts flagged where |n − median| > 3·MAD (median absolute
    deviation). Median/MAD instead of mean/stddev so the anomalies
    themselves cannot drag the baseline (the classic monitoring
    failure). Plan: the fact table collapses to |hours| rows in one
    two-phase agg; the two robust scalars are 1-row aggregates OVER
    THAT (not over raw events) broadcast back — the raw table is
    scanned exactly once regardless of scale. Robust z = 0.6745·(n −
    med)/MAD (the normal-consistency constant)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    med = counts.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("double")
        .alias("med")
    )
    dev = counts.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)")
        .cast("double")
        .alias("mad")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter((F.col("mad") > 0) & (F.col("abs_dev") > 3 * F.col("mad")))
        .select(
            F.date_format("hour", TS_FMT).alias("hour_ts"),
            "n",
            det_round(F.lit(0.6745) * (F.col("n") - F.col("med")) / F.col("mad"), 4).alias(
                "robust_z"
            ),
        )
        .orderBy("hour_ts")
    )


_ANOMALY_ORACLE = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1
),
med AS (SELECT quantile_disc(n, 0.5)::DOUBLE AS med FROM c),
dev AS (SELECT c.hour, c.n, abs(c.n - med.med) AS abs_dev, med.med FROM c, med),
mad AS (SELECT quantile_disc(abs_dev, 0.5)::DOUBLE AS mad FROM dev)
SELECT strftime(dev.hour, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       dev.n,
       (floor((0.6745 * (dev.n - dev.med) / mad.mad) * 10000.0 + 0.5) / 10000.0) AS robust_z
FROM dev, mad
WHERE mad.mad > 0 AND dev.abs_dev > 3 * mad.mad
ORDER BY hour_ts
"""


# --- watermark-lateness report (streaming-config evidence) -----------------

#: candidate watermark settings to evaluate, in ms (the reference
#: hardcodes 5 s — events_postgres_sink.sql:27 — with no evidence;
#: this report derives the drop cost of each candidate from the data)
_WM_THRESH_MS = (0, 1000, 5000, 30000)
#: arrival-order chunk width for the distributed prefix-scan
_WM_CHUNK = 10_000


def _watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late does this stream actually run? For each candidate
    watermark W: how many events arrive with event-time more than W
    behind the max event-time already seen (and would therefore be
    dropped by the window operator). Arrival order = event_id (the
    producer's generation sequence — the replay's delivery order).

    The naive formulation is max(ts) OVER (ORDER BY event_id) — a
    GLOBAL running max, which is one sequential task at any scale. The
    scale shape here is a DISTRIBUTED PREFIX SCAN: (1) per-chunk
    prefix max (window partitioned by arrival chunk — parallel), (2)
    per-chunk totals reduced to a cumulative previous-chunks max (a
    window over |chunks| rows — n/10k, trivially one task), (3)
    broadcast the chunk prefixes back. Same two-level trick as
    parallel prefix-sum; the only sequential step touches one row per
    chunk, not one per event.

    Verdict on this dataset: the replay is timestamp-ordered, so even
    W=0 drops nothing — evidence the reference's 5 s is safely
    conservative here, and the report is what justifies tightening or
    loosening it when the transport actually reorders (behavior under
    real disorder is pytest-proven on a synthetic shuffled stream)."""
    return watermark_lateness_report(
        load_table(spark, sf_dir, "events").select("event_id", "ts")
    )


def watermark_lateness_report(ev: DataFrame) -> DataFrame:
    """Distributed prefix-scan lateness over any (event_id, ts) frame —
    see `_watermark_lateness` for the full story; property-tested on a
    synthetic disordered stream (`test_watermark_lateness_on_disorder`)."""
    chunked = ev.withColumn("chunk", F.expr(f"event_id div {_WM_CHUNK}"))
    w_in = (
        Window.partitionBy("chunk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_in = chunked.withColumn("in_max", F.max("ts").over(w_in))
    per_chunk = chunked.groupBy("chunk").agg(F.max("ts").alias("cmax"))
    w_c = Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
    prev_max = per_chunk.select(
        "chunk", F.max("cmax").over(w_c).alias("prev_cmax")
    )
    # Spark's greatest() skips NULLs, so the in-chunk/previous-chunk
    # combination is safe — but the GLOBAL first row has neither, and
    # engines disagree on greatest(0, NULL); make the no-predecessor
    # case an explicit 0 in both formulations
    runmax = F.greatest("in_max", "prev_cmax")
    late_us = F.when(runmax.isNull(), F.lit(0).cast("long")).otherwise(
        F.greatest(
            F.lit(0).cast("long"),
            F.unix_micros(runmax) - F.unix_micros(F.col("ts")),
        )
    )
    lat = (
        with_in.join(F.broadcast(prev_max), "chunk")
        .select(late_us.alias("late_us"))
    )
    th = F.explode(
        F.array(*[F.lit(t).alias("t") for t in _WM_THRESH_MS])
    ).alias("watermark_ms")
    return (
        lat.select("late_us", th)
        .groupBy("watermark_ms")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("late_us") > F.col("watermark_ms") * 1000, 1)).alias(
                "n_dropped"
            ),
        )
        .select(
            "watermark_ms",
            "n_events",
            "n_dropped",
            det_round(F.col("n_dropped") / F.col("n_events"), 6).alias("drop_frac"),
        )
        .orderBy("watermark_ms")
    )


_WM_LATENESS_ORACLE = f"""
WITH l AS (
  SELECT ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS runmax
  FROM events
),
lat AS (
  SELECT CASE WHEN runmax IS NULL THEN 0
              ELSE greatest(0, date_diff('microsecond', ts, runmax)) END AS late_us
  FROM l
)
SELECT t.watermark_ms,
       count(*) AS n_events,
       count(*) FILTER (WHERE late_us > t.watermark_ms * 1000) AS n_dropped,
       (floor((count(*) FILTER (WHERE late_us > t.watermark_ms * 1000) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS drop_frac
FROM lat CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _WM_THRESH_MS)}])
                     AS watermark_ms) t
GROUP BY t.watermark_ms
ORDER BY watermark_ms
"""


# --- data-quality expectations gate ---------------------------------------


def _dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DQ gate a production ingest runs before publishing a batch:
    one row per declared expectation — (check_name, violations,
    passed) — covering the constraint classes warehouse loads break:
    primary-key uniqueness, referential integrity, and null rates.

    Every check is a distributed aggregate or anti-join (never a
    driver-side scan): PK checks are count − countDistinct in ONE pass;
    FK checks are LEFT ANTI joins (the nation side broadcasts, the
    orders side is a key-projected shuffle join — at 100 TB exactly the
    plan you want, since only the KEY column of the parent ever
    moves). The union of one-row aggregates costs one job; a failed
    gate reads as `passed = false` rows, not an exception, so the
    caller decides whether to quarantine or halt."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    checks = [
        one(
            "orders_pk_unique",
            orders.agg(
                (F.count("*") - F.countDistinct("o_orderkey")).alias("violations")
            ),
        ),
        one(
            "documents_pk_unique",
            documents.agg(
                (F.count("*") - F.countDistinct("doc_id")).alias("violations")
            ),
        ),
        one(
            "lineitem_orderkey_fk",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem["l_orderkey"] == orders["o_orderkey"],
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        one(
            "customer_nationkey_fk",
            customer.join(
                F.broadcast(nation.select("n_nationkey")),
                customer["c_nationkey"] == nation["n_nationkey"],
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        one(
            "events_user_id_not_null",
            events.agg(
                F.count(F.when(F.col("user_id").isNull(), 1)).alias("violations")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("check_name")


_DQ_ORACLE = """
SELECT check_name, violations, violations = 0 AS passed FROM (
  SELECT 'orders_pk_unique' AS check_name,
         count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
  UNION ALL
  SELECT 'documents_pk_unique', count(*) - count(DISTINCT doc_id) FROM documents
  UNION ALL
  -- NOT EXISTS, not NOT IN: LEFT ANTI (the Spark side) counts a NULL
  -- child key as a violation, while NOT IN silently drops it — and
  -- returns zero violations outright if the parent side ever holds a
  -- NULL. NOT EXISTS matches anti-join semantics under NULLs exactly.
  SELECT 'lineitem_orderkey_fk', count(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'customer_nationkey_fk', count(*) FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
  UNION ALL
  SELECT 'events_user_id_not_null', count(*) FILTER (WHERE user_id IS NULL)
  FROM events
)
ORDER BY check_name
"""


# --- inter-event gap distribution (session-gap sizing evidence) -------------

#: candidate session-idle thresholds to cost out, minutes (the
#: reference hardcodes 30 — analysis/flink-analysis.sql:101 — with no
#: evidence; this report derives each candidate's session-break rate)
_GAP_THRESH_MIN = (5, 30, 60)


def _session_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long do users actually pause? The think-time distribution
    behind session-gap sizing — the companion of
    `profile_watermark_lateness` (that one justifies the watermark,
    this one the 30-min idle threshold the reference hardcodes):
    per-user consecutive inter-event gaps (one LAG over the user_id
    exchange), then ONE global aggregate — exact discrete percentiles
    of the gap in seconds (percentile_disc picks actual data values, so
    cross-engine equality is trivial) and, per candidate threshold, the
    share of gaps that would break a session. A p95 well under the
    chosen threshold says sessions rarely fragment; a break-share cliff
    between candidates shows where the threshold actually matters."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .filter(F.col("prev_ts").isNotNull())
        .select(
            ((F.unix_micros("ts") - F.unix_micros("prev_ts")) / F.lit(1_000_000))
            .cast("long")
            .alias("gap_s")  # whole seconds: floor division, exact both engines
        )
    )
    break_cols = [
        det_round(
            F.count(F.when(F.col("gap_s") > t * 60, 1)) / F.count("*"), 6
        ).alias(f"break_share_{t}m")
        for t in _GAP_THRESH_MIN
    ]
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        # percentile_disc PICKS an existing gap_s value but Spark types
        # the result DOUBLE; cast back to the discrete long domain
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s) AS LONG)"
        ).alias("p50_s"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s) AS LONG)"
        ).alias("p90_s"),
        F.expr(
            "CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_s) AS LONG)"
        ).alias("p99_s"),
        F.max("gap_s").alias("max_s"),
        *break_cols,
    )


_GAP_BREAK_SQL = ",\n       ".join(
    f"(floor((count(*) FILTER (WHERE gap_s > {t * 60})"
    f" / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)"
    f" AS break_share_{t}m"
    for t in _GAP_THRESH_MIN
)

_SESSION_GAP_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
gaps AS (
  SELECT date_diff('microsecond', prev_ts, ts) // 1000000 AS gap_s
  FROM o WHERE prev_ts IS NOT NULL
)
SELECT count(*) AS n_gaps,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s) AS p50_s,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s) AS p90_s,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_s) AS p99_s,
       max(gap_s) AS max_s,
       {_GAP_BREAK_SQL}
FROM gaps
"""


# --- functional-dependency discovery ---------------------------------------

#: candidate (table, determinant, dependent) triples to test — the
#: schema-discovery pass a profiler runs before trusting assumed
#: relationships (a violated "FD" the pipeline relies on, e.g. a
#: supposedly 1:1 id mapping, is a silent join-fanout bug waiting)
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),       # PK ⇒ holds
    ("orders", "o_custkey", "o_orderpriority"),  # many orders/cust ⇒ fails
    ("lineitem", "l_orderkey", "l_suppkey"),     # multi-supplier orders ⇒ fails
    ("documents", "doc_id", "lang"),             # PK ⇒ holds
    ("documents", "source", "lang"),             # sources are multilingual?
    ("events", "event_id", "user_id"),           # PK ⇒ holds
)


def _fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check A → B per declared candidate: the FD
    holds iff |distinct A| == |distinct (A,B)| (every determinant value
    maps to exactly one dependent value). Both counts ride ONE
    two-phase aggregate over the distinct pair set per candidate —
    |pairs| ≤ |rows|, map-side combine collapses the Zipf head, and the
    union of per-candidate one-row aggregates is a single job. Output:
    (table_name, determinant, dependent, n_keys, n_pairs, holds)."""
    outs = []
    for table, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        # r13 (guide §2.4): distinct-pairs + countDistinct(a) re-shuffled
        # the distinct pair set a second time; one groupBy(a) over the
        # two-phase (a, b) aggregate yields both counts from a single
        # full-data exchange (n_keys = rows of the per-key rollup,
        # n_pairs = sum of per-key distinct-b counts).
        agg = (
            t.select(F.col(det).alias("a"), F.col(dep).alias("b"))
            .groupBy("a", "b")
            .agg(F.lit(1).alias("one"))
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("nb"))
            .agg(
                # count(a), not count(*): the oracle's count(DISTINCT a)
                # excludes a NULL determinant value while the per-key
                # rollup keeps it as a group, so the key count must skip
                # the NULL-key row; n_pairs (count(*) over the distinct
                # pair set) keeps NULL-determinant pairs in BOTH engines
                # (r14, ADVICE r13 — current candidates are non-null so
                # the outputs are identical, but the semantics now hold
                # for any data)
                F.count(F.col("a")).alias("n_keys"),
                F.sum("nb").alias("n_pairs"),
            )
        )
        outs.append(
            agg.select(
                F.lit(table).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_keys",
                "n_pairs",
                (F.col("n_keys") == F.col("n_pairs")).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "determinant", "dependent")


_FD_ORACLE = (
    "SELECT table_name, determinant, dependent, n_keys, n_pairs,\n"
    "       n_keys = n_pairs AS holds FROM (\n"
    + "\n  UNION ALL\n".join(
        f"""  SELECT '{t}' AS table_name, '{a}' AS determinant, '{b}' AS dependent,
         count(DISTINCT {a}) AS n_keys,
         count(*) AS n_pairs
  FROM (SELECT DISTINCT {a}, {b} FROM {t})"""
        for t, a, b in _FD_CANDIDATES
    )
    + "\n)\nORDER BY table_name, determinant, dependent"
)


# --- SCD2 state history (gaps-and-islands) ---------------------------------


def _scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing state history per user — the interval
    twin of `cdc_latest_state_per_user` (which keeps only the latest
    row): collapse each user's event stream into runs of consecutive
    equal event_type, emitting (state, valid_from, valid_to,
    is_current) rows — the gaps-and-islands pattern every warehouse
    dimension build uses (change marks via LAG, run ids via running
    SUM, interval close via LEAD over the run table).

    Plan shape: ONE shuffle on user_id serves the LAG window, the
    running sum, the per-run aggregate AND the LEAD window — all four
    are partitioned by user_id, so Catalyst reuses the exchange.
    Output is runs-per-user sized (corpus-scale, unsorted)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = marks.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    hist = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),  # constant within a run
        F.min("ts").alias("vf"),
        F.count("*").alias("n_events"),
    )
    w_run = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(w_run)
    return hist.select(
        "user_id",
        "state",
        F.date_format("vf", TS_FMT).alias("valid_from"),
        F.date_format(nxt, TS_FMT).alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state
  FROM events
),
marks AS (
  SELECT *, CASE WHEN prev_state IS NULL OR prev_state <> event_type
                 THEN 1 ELSE 0 END AS chg
  FROM ordered
),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marks
),
hist AS (
  SELECT user_id, run_id, min(event_type) AS state, min(ts) AS vf,
         count(*) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, state,
       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY run_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       n_events,
       lead(vf) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
         AS is_current
FROM hist
"""


# --- corpus composition by source ------------------------------------------


def _source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-`source` corpus composition — the first report a corpus
    owner asks for before weighting sources in a training mix: docs,
    token mass, exact-duplicate rate, mean quality, and the dominant
    language with its share. One scan feeds two aggregations (the
    per-source rollup and the (source, lang) counts for the mode);
    the final join is on `source` — dimension-sized, broadcast. The
    duplicate rate reuses `dedup_exact`'s content fingerprint so the
    number can never drift from the dedup family's definition. All
    rates are integer ppm (floor-division in both engines); the lang
    mode tiebreak is (count DESC, lang ASC) with NULL langs coalesced
    to '' — Spark and DuckDB default NULL ordering differs, so NULLs
    never reach the ORDER BY."""
    from kafka_flink_streaming_pipeline_spark.operators.text import quality_scores

    d = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    base = d.select(
        "doc_id",
        "source",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.md5(normalized.cast("binary")).alias("fingerprint"),
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "n_tokens", "quality_score")
    qppm = F.floor(F.col("quality_score") * 1000000.0 + F.lit(0.5)).cast("bigint")
    per_doc = base.join(q, "doc_id")
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("fingerprint").alias("n_unique"),
        F.sum(qppm).alias("q_sum"),
    )
    # lang mode needs no quality column — aggregate from `base`, not
    # `per_doc`, so the regex-heavy quality subtree is evaluated once
    # per engine, not once per consuming branch (quality_scores covers
    # every doc, so the doc set is identical). Same fix in the oracle.
    lang_counts = base.groupBy("source", "lang").agg(F.count("*").alias("n_lang"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_lang").desc(), F.col("lang").asc()
    )
    top = (
        lang_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "n_lang")
    )
    return (
        agg.join(F.broadcast(top), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("CAST((n_docs - n_unique) * 1000000 DIV n_docs AS BIGINT)").alias(
                "dup_ppm"
            ),
            F.expr("CAST(q_sum DIV n_docs AS BIGINT)").alias("mean_quality_ppm"),
            "top_lang",
            F.expr("CAST(n_lang * 1000000 DIV n_docs AS BIGINT)").alias(
                "top_lang_ppm"
            ),
        )
        .orderBy("source")
    )


def _source_mix_oracle() -> str:
    from kafka_flink_streaming_pipeline_spark.operators.text import quality_cte

    return f"""
WITH {quality_cte()},
base AS (
  SELECT doc_id, source, coalesce(lang, '') AS lang,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM documents
),
per_doc AS (
  SELECT b.*, q.n_tokens,
         CAST(floor(q.quality_score * 1000000.0 + 0.5) AS BIGINT) AS qppm
  FROM base b JOIN q USING (doc_id)
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
         count(DISTINCT fingerprint) AS n_unique, sum(qppm) AS q_sum
  FROM per_doc GROUP BY source
),
lc AS (SELECT source, coalesce(lang, '') AS lang, count(*) AS n_lang
       FROM documents GROUP BY source, coalesce(lang, '')),
top AS (
  SELECT source, lang AS top_lang, n_lang,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_lang DESC, lang ASC) AS rn
  FROM lc
)
SELECT a.source,
       CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.n_tokens AS BIGINT) AS n_tokens,
       CAST((a.n_docs - a.n_unique) * 1000000 // a.n_docs AS BIGINT) AS dup_ppm,
       CAST(a.q_sum // a.n_docs AS BIGINT) AS mean_quality_ppm,
       t.top_lang,
       CAST(t.n_lang * 1000000 // a.n_docs AS BIGINT) AS top_lang_ppm
FROM agg a JOIN top t ON t.source = a.source AND t.rn = 1
ORDER BY a.source
"""


# --- day-over-day distribution drift ----------------------------------------


def _category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: for every day, the L1 distance (in
    integer ppm) between the day's event_type share vector and the
    previous day's, plus the single type that moved most. This is the
    ingest-health check a 100 TB pipeline alarms on — schema-valid data
    whose CATEGORY MIX silently shifts (a client rollout, a bot wave)
    passes every row-level expectation in `dq_expectations` and shows
    up only here.

    Plan: one scan → (day, type) counts (map-side partial agg) → the
    per-day share table; the day spine is dimension-sized, so the
    lag() that pairs consecutive days is a single tiny window, and the
    share self-join on (day-pair, type) is bounded by |days|×|types|
    rows. All shares are integer ppm (floor division) and the L1 sum
    is exact integer arithmetic — hash-stable by construction."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = per.groupBy("day").agg(F.sum("n").alias("day_total"))
    shares = per.join(tot, "day").select(
        "day",
        "event_type",
        F.expr("CAST(n * 1000000 DIV day_total AS BIGINT)").alias("ppm"),
    )
    wd = Window.orderBy("day")
    pairs = (
        shares.select("day")
        .distinct()
        .select("day", F.lag("day").over(wd).alias("prev_day"))
        .filter(F.col("prev_day").isNotNull())
    )
    cur = pairs.join(
        shares.select("day", "event_type", F.col("ppm").alias("ppm_t")), "day"
    )
    prv = pairs.join(
        shares.select(
            F.col("day").alias("prev_day"), "event_type", F.col("ppm").alias("ppm_p")
        ),
        "prev_day",
    )
    delta = F.coalesce("ppm_t", F.lit(0)) - F.coalesce("ppm_p", F.lit(0))
    merged = cur.join(prv, ["day", "prev_day", "event_type"], "full_outer").select(
        "day", "event_type", delta.alias("delta_ppm")
    )
    l1 = merged.groupBy("day").agg(
        F.count("*").alias("n_types"),
        F.sum(F.abs("delta_ppm")).alias("l1_ppm"),
    )
    wt = Window.partitionBy("day").orderBy(
        F.abs("delta_ppm").desc(), F.col("event_type").asc()
    )
    top = (
        merged.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .select("day", F.col("event_type").alias("top_type"),
                F.col("delta_ppm").alias("top_delta_ppm"))
    )
    return l1.join(top, "day").orderBy("day")


_CATEGORY_DRIFT_ORACLE = """
WITH per AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
  FROM events GROUP BY day, event_type
),
tot AS (SELECT day, sum(n) AS day_total FROM per GROUP BY day),
shares AS (
  SELECT per.day, per.event_type,
         CAST(per.n * 1000000 // tot.day_total AS BIGINT) AS ppm
  FROM per JOIN tot ON tot.day = per.day
),
pairs AS (
  SELECT day, lag(day) OVER (ORDER BY day) AS prev_day
  FROM (SELECT DISTINCT day FROM shares)
  QUALIFY prev_day IS NOT NULL
),
cur AS (
  SELECT p.day, p.prev_day, s.event_type, s.ppm AS ppm_t
  FROM pairs p JOIN shares s ON s.day = p.day
),
prv AS (
  SELECT p.day, p.prev_day, s.event_type, s.ppm AS ppm_p
  FROM pairs p JOIN shares s ON s.day = p.prev_day
),
merged AS (
  SELECT day, event_type,
         coalesce(ppm_t, 0) - coalesce(ppm_p, 0) AS delta_ppm
  FROM cur FULL JOIN prv USING (day, prev_day, event_type)
),
l1 AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(abs(delta_ppm)) AS BIGINT) AS l1_ppm
  FROM merged GROUP BY day
),
top AS (
  SELECT day, event_type AS top_type, delta_ppm AS top_delta_ppm,
         row_number() OVER (PARTITION BY day
                            ORDER BY abs(delta_ppm) DESC, event_type ASC) AS rn
  FROM merged
)
SELECT l1.day, l1.n_types, l1.l1_ppm, top.top_type, top.top_delta_ppm
FROM l1 JOIN top ON top.day = l1.day AND top.rn = 1
ORDER BY l1.day
"""


# --- numeric drift: population stability index -----------------------------

_PSI_B = 10  # equi-width buckets over the metric's global range


def _psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the events `value` metric between
    the first and second half of the data's time range — THE standard
    ML-ops numeric-drift gate (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 act). Output per equi-width bucket: the two integer-ppm
    shares and the bucket's PSI term in integer micro-units
    ((p_cur − p_ref)·ln(p_cur/p_ref), add-one-smoothed on the ppm
    scale); the report's consumer sums the terms.

    Cross-engine discipline: the period split avoids timestamp
    midpoint DIVISION entirely (2·ts_us < min_us + max_us is the same
    comparison with no truncation to disagree on); bucket assignment
    is one double expression identical in both engines; each ln rounds
    once to micro-nats; and every PSI term is structurally
    NON-NEGATIVE ((a−b) and ln((a+1)/(b+1)) always share a sign), so
    the final integer division needs no signed-floor shift.

    Plan shape at 100 TB: one scan → map-side bucket+period flags →
    one {_PSI_B}-row aggregation; the range and totals are broadcast
    1-row aggregates."""
    ev = load_table(spark, sf_dir, "events").select(
        "value", F.unix_micros("ts").alias("us")
    )
    stats = ev.agg(
        F.min("us").alias("us_min"),
        F.max("us").alias("us_max"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )
    j = ev.crossJoin(F.broadcast(stats))
    is_ref = (F.col("us") * 2) < (F.col("us_min") + F.col("us_max"))
    b = F.coalesce(
        F.least(
            F.floor(
                (F.col("value") - F.col("v_min"))
                * _PSI_B
                / F.nullif(F.col("v_max") - F.col("v_min"), F.lit(0))
            ),
            F.lit(_PSI_B - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    counts = (
        j.select(b.alias("bucket"), is_ref.alias("r"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("r"), 1).otherwise(0)).cast("bigint").alias("c_ref"),
            F.sum(F.when(F.col("r"), 0).otherwise(1)).cast("bigint").alias("c_cur"),
        )
    )
    tot = counts.agg(
        F.sum("c_ref").cast("bigint").alias("t_ref"),
        F.sum("c_cur").cast("bigint").alias("t_cur"),
    )
    ln_u = F.floor(
        F.log(
            (F.col("cur_ppm") + 1).cast("double") / (F.col("ref_ppm") + 1)
        )
        * 1_000_000
        + F.lit(0.5)
    ).cast("bigint")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr("c_ref * 1000000 DIV t_ref").alias("ref_ppm"),
            F.expr("c_cur * 1000000 DIV t_cur").alias("cur_ppm"),
        )
        .select(
            "bucket",
            "ref_ppm",
            "cur_ppm",
            ((F.col("cur_ppm") - F.col("ref_ppm")) * ln_u)
            .cast("bigint")
            .alias("prod"),
        )
        .select(
            "bucket",
            "ref_ppm",
            "cur_ppm",
            F.expr("prod DIV 1000000").alias("psi_term_micro"),
        )
        .orderBy("bucket")
    )


_PSI_ORACLE = f"""
WITH ev AS (
  SELECT value, epoch_us(ts) AS us FROM events
),
stats AS (
  SELECT min(us) AS us_min, max(us) AS us_max,
         min(value) AS v_min, max(value) AS v_max
  FROM ev
),
counts AS (
  SELECT coalesce(least(CAST(floor((value - v_min) * {_PSI_B}
                                   / nullif(v_max - v_min, 0)) AS BIGINT),
                        {_PSI_B - 1}), 0) AS bucket,
         CAST(sum(CASE WHEN us * 2 < us_min + us_max THEN 1 ELSE 0 END)
              AS BIGINT) AS c_ref,
         CAST(sum(CASE WHEN us * 2 < us_min + us_max THEN 0 ELSE 1 END)
              AS BIGINT) AS c_cur
  FROM ev CROSS JOIN stats
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(c_ref) AS BIGINT) AS t_ref,
         CAST(sum(c_cur) AS BIGINT) AS t_cur
  FROM counts
),
shares AS (
  SELECT bucket,
         c_ref * 1000000 // t_ref AS ref_ppm,
         c_cur * 1000000 // t_cur AS cur_ppm
  FROM counts CROSS JOIN tot
)
SELECT bucket, ref_ppm, cur_ppm,
       ((cur_ppm - ref_ppm)
        * CAST(floor(ln(CAST(cur_ppm + 1 AS DOUBLE) / (ref_ppm + 1)) * 1000000
                     + 0.5) AS BIGINT)) // 1000000 AS psi_term_micro
FROM shares
ORDER BY bucket
"""


# --- privacy: k-anonymity profile -----------------------------------------

_KANON_RISK = 5  # classes smaller than this are "at risk" (Sweeney's k)


def _k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity profile (Sweeney 2002) of the events table under
    the quasi-identifier (event_type, hour-of-day, props.k): how big
    are the equivalence classes a re-identification attack would
    intersect? Output per class-size bucket: classes, rows, row share
    (integer ppm), and the distinct-user floor (the l-diversity
    signal: a bucket whose min_users is 1 contains classes that pin a
    single user). The release gate a training-data pipeline runs
    before shipping event-derived features.

    Plan shape at 100 TB: one groupBy over the QI triple (map-side
    combinable; class table ≪ corpus), then a ~4-row rollup —
    aggregation-shaped, no joins, no Python. The total for the ppm
    share is a broadcast 1-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    classes = (
        ev.select(
            "event_type",
            F.date_format("ts", "HH").alias("hh"),
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("pk"),
            "user_id",
        )
        .groupBy("event_type", "hh", "pk")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    bucket = (
        F.when(F.col("n") == 1, "1")
        .when(F.col("n") < _KANON_RISK, f"2-{_KANON_RISK - 1}")
        .when(F.col("n") < 2 * _KANON_RISK, f"{_KANON_RISK}-{2 * _KANON_RISK - 1}")
        .otherwise(f"{2 * _KANON_RISK}+")
    )
    total = ev.groupBy().agg(F.count("*").alias("t"))
    return (
        classes.select(bucket.alias("class_size"), "n", "n_users")
        .groupBy("class_size")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.min("n_users").cast("bigint").alias("min_users"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            F.expr("n_rows * 1000000 DIV t").alias("row_share_ppm"),
            "min_users",
        )
        .orderBy("class_size")
    )


_K_ANONYMITY_ORACLE = f"""
WITH classes AS (
  SELECT event_type, strftime(ts, '%H') AS hh,
         CAST(json_extract(props, '$.k') AS INT) AS pk,
         count(*) AS n, count(DISTINCT user_id) AS n_users
  FROM events
  GROUP BY 1, 2, 3
),
tot AS (SELECT count(*) AS t FROM events)
SELECT CASE WHEN n = 1 THEN '1'
            WHEN n < {_KANON_RISK} THEN '2-{_KANON_RISK - 1}'
            WHEN n < {2 * _KANON_RISK} THEN '{_KANON_RISK}-{2 * _KANON_RISK - 1}'
            ELSE '{2 * _KANON_RISK}+' END AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(n) AS BIGINT) * 1000000 // t AS row_share_ppm,
       CAST(min(n_users) AS BIGINT) AS min_users
FROM classes CROSS JOIN tot
GROUP BY class_size, t
ORDER BY class_size
"""


_EMB_SHIFT = 2_000_000  # same positive-domain device as the k-means trainer
_EMB_DIM = 64


def _embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift of the embedding store's mean vector
    between the first and second half of the ingest order (vec_id
    halves — yesterday's batch vs today's): the vector-store sibling
    of `profile_psi_drift`. A silently drifting embedding model (or a
    re-embedding run that changed normalization) shifts per-dim means
    long before top-k overlap metrics move; this report catches it per
    rebuild::

        dim | mean_ref_micro | mean_cur_micro | abs_delta_micro

    Integer discipline: dims round once to micro units, the +{_EMB_SHIFT}
    shift keeps the floor-mean division on non-negative operands
    (Spark DIV ≡ DuckDB // only there), and the de-shift is a
    subtraction, sign-safe. The half split is the PSI device —
    2·vec_id < min+max, no midpoint division.

    At 100 TB: one scan → posexplode → a {_EMB_DIM}×2-key aggregation
    (map-side combine does the work); the id range is a broadcast
    1-row aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    stats = e.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi"))
    pts = (
        e.crossJoin(F.broadcast(stats))
        .select(
            ((F.col("vec_id") * 2) < (F.col("lo") + F.col("hi"))).alias("is_ref"),
            F.posexplode("embedding").alias("dim", "x"),
        )
        .select(
            "is_ref",
            "dim",
            (
                F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(0.5)).cast(
                    "bigint"
                )
                + F.lit(_EMB_SHIFT)
            ).alias("xm"),
        )
    )
    agg = pts.groupBy("dim").agg(
        F.expr(
            "CAST(sum(CASE WHEN is_ref THEN xm ELSE 0 END)"
            " DIV sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("m_ref_sh"),
        F.expr(
            "CAST(sum(CASE WHEN is_ref THEN 0 ELSE xm END)"
            " DIV sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)"
        ).alias("m_cur_sh"),
    )
    return (
        agg.select(
            F.col("dim").cast("int").alias("dim"),
            (F.col("m_ref_sh") - _EMB_SHIFT).alias("mean_ref_micro"),
            (F.col("m_cur_sh") - _EMB_SHIFT).alias("mean_cur_micro"),
            F.abs(F.col("m_cur_sh") - F.col("m_ref_sh")).alias("abs_delta_micro"),
        )
        .orderBy("dim")
    )


_EMBEDDING_DRIFT_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
stats AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM e0),
pts AS (
  SELECT (e0.vec_id * 2) < (s.lo + s.hi) AS is_ref, d.dim,
         CAST(floor(v[d.dim + 1] * 1000000 + 0.5) AS BIGINT) + {_EMB_SHIFT} AS xm
  FROM e0 CROSS JOIN stats s
  CROSS JOIN (SELECT unnest(range(0, {_EMB_DIM})) AS dim) d
),
agg AS (
  SELECT dim,
         CAST(CAST(sum(CASE WHEN is_ref THEN xm ELSE 0 END) AS BIGINT)
              // sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS m_ref_sh,
         CAST(CAST(sum(CASE WHEN is_ref THEN 0 ELSE xm END) AS BIGINT)
              // sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS m_cur_sh
  FROM pts GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim,
       m_ref_sh - {_EMB_SHIFT} AS mean_ref_micro,
       m_cur_sh - {_EMB_SHIFT} AS mean_cur_micro,
       abs(m_cur_sh - m_ref_sh) AS abs_delta_micro
FROM agg
ORDER BY dim
"""


def _erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten accounting — the report a deletion run
    files BEFORE it mutates anything: per table, how many rows the
    erasure set touches, through the referential cascade::

        table | n_rows | n_erased | erased_ppm

    The erasure set is the deterministic id device (key % 97 == 0 —
    the same family as the eval split): `customer` rows by c_custkey,
    `orders` by the blocked custkeys (hop 1), `lineitem` by the
    blocked orderkeys (hop 2), and `events` by its own user_id rule
    (independent id domain). ppm is the pure-BIGINT two-step division.

    At 100 TB: the blocked customer keys and blocked order keys are
    the small sides — each hop is one broadcast semi-join flag +
    count aggregation, one scan per table, no wide exchange. The
    actual delete is these same predicates as an anti-join rewrite;
    auditing first is what makes the delete reviewable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    blocked_c = F.col("c_custkey") % 97 == 0
    o_flag = orders.select(
        "o_orderkey", (F.col("o_custkey") % 97 == 0).alias("hit")
    )
    li_flag = li.select("l_orderkey").join(
        o_flag.filter("hit").select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )

    def row(name: str, total_df: DataFrame, erased_df: DataFrame) -> DataFrame:
        t = total_df.agg(F.count("*").cast("bigint").alias("n_rows"))
        e = erased_df.agg(F.count("*").cast("bigint").alias("n_erased"))
        return (
            t.crossJoin(e)
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_erased",
                F.expr(
                    "(n_erased DIV n_rows) * 1000000"
                    " + ((n_erased % n_rows) * 1000000) DIV n_rows"
                ).alias("erased_ppm"),
            )
        )

    out = row("customer", cust, cust.filter(blocked_c))
    out = out.unionByName(row("orders", o_flag, o_flag.filter("hit")))
    out = out.unionByName(row("lineitem", li.select("l_orderkey"), li_flag))
    out = out.unionByName(
        row("events", ev.select("user_id"), ev.filter(F.col("user_id") % 97 == 0))
    )
    return out.orderBy("table_name")


_ERASURE_AUDIT_ORACLE = """
WITH rows_per AS (
  SELECT 'customer' AS table_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_erased
  FROM customer
  UNION ALL
  SELECT 'orders',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o.o_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT 'events',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
)
SELECT table_name, n_rows, n_erased,
       CAST((n_erased // n_rows) * 1000000
            + ((n_erased % n_rows) * 1000000) // n_rows AS BIGINT)
         AS erased_ppm
FROM rows_per
ORDER BY table_name
"""


QUERIES: dict[str, QuerySpec] = {
    "profile_embedding_drift": QuerySpec(
        "profile_embedding_drift",
        _embedding_drift,
        _EMBEDDING_DRIFT_ORACLE,
        "per-dimension integer mean drift of the embedding store "
        "between ingest halves (the vector-store PSI sibling)",
    ),
    "privacy_erasure_audit": QuerySpec(
        "privacy_erasure_audit",
        _erasure_audit,
        _ERASURE_AUDIT_ORACLE,
        "right-to-be-forgotten accounting: rows touched per table "
        "through the customer->orders->lineitem cascade + events",
    ),
    "profile_psi_drift": QuerySpec(
        "profile_psi_drift",
        _psi_drift,
        _PSI_ORACLE,
        "population stability index of the value metric between time "
        "halves: per-bucket ppm shares + non-negative integer PSI terms",
    ),
    "privacy_k_anonymity": QuerySpec(
        "privacy_k_anonymity",
        _k_anonymity,
        _K_ANONYMITY_ORACLE,
        "k-anonymity equivalence-class profile of events under the "
        "(event_type, hour, props.k) quasi-identifier, with "
        "distinct-user floor per size bucket",
    ),
    "profile_category_drift": QuerySpec(
        "profile_category_drift",
        _category_drift,
        _CATEGORY_DRIFT_ORACLE,
        "day-over-day L1 drift of the event_type mix + top mover (integer ppm)",
    ),
    "profile_source_mix": QuerySpec(
        "profile_source_mix",
        _source_mix,
        _source_mix_oracle(),
        "per-source corpus composition: docs/tokens/dup-rate/quality/top-lang",
    ),
    "profile_watermark_lateness": QuerySpec(
        "profile_watermark_lateness",
        _watermark_lateness,
        _WM_LATENESS_ORACLE,
        "per-watermark drop cost from arrival-order lateness (distributed prefix-scan)",
    ),
    "dq_expectations": QuerySpec(
        "dq_expectations",
        _dq_expectations,
        _DQ_ORACLE,
        "data-quality gate: PK/FK/null expectations as one union of aggregates",
    ),
    "profile_functional_deps": QuerySpec(
        "profile_functional_deps",
        _fd_discovery,
        _FD_ORACLE,
        "functional-dependency discovery over declared candidate column pairs",
    ),
    "profile_session_gap_quantiles": QuerySpec(
        "profile_session_gap_quantiles",
        _session_gap_profile,
        _SESSION_GAP_ORACLE,
        "inter-event gap distribution + per-threshold session-break shares",
    ),
    "scd2_user_state_history": QuerySpec(
        "scd2_user_state_history",
        _scd2_user_state_history,
        _SCD2_ORACLE,
        "SCD2 interval dimension: gaps-and-islands state runs per user",
    ),
    "profile_equidepth_histogram": QuerySpec(
        "profile_equidepth_histogram",
        _equidepth_histogram,
        _EQUIDEPTH_ORACLE,
        "equi-depth histogram: broadcast quantile boundaries + map-side CASE bucketing",
    ),
    "profile_anomalous_hours": QuerySpec(
        "profile_anomalous_hours",
        _anomalous_hours,
        _ANOMALY_ORACLE,
        "median/MAD robust volume anomaly flags over hourly ingest counts",
    ),
    "profile_gapfill_minutely": QuerySpec(
        "profile_gapfill_minutely",
        _gapfill_minutely,
        _GAPFILL_ORACLE,
        "time-series densification: generated minute spine ⟕ pre-aggregated counts",
    ),
    "profile_key_skew": QuerySpec(
        "profile_key_skew",
        _key_skew_profile,
        _KEY_SKEW_ORACLE,
        "join-key skew diagnostic: per-key counts reduced to distribution stats",
    ),
    "profile_histogram_order_totals": QuerySpec(
        "profile_histogram_order_totals",
        _histogram_order_totals,
        _HISTOGRAM_ORACLE,
        "equi-width histogram: map-side bucketing, |buckets|-row shuffle",
    ),
    "profile_orders_one_pass": QuerySpec(
        "profile_orders_one_pass",
        _profile_orders,
        _PROFILE_ORACLE,
        "one-pass column profile: nulls/distincts/ranges in a single aggregate",
    ),
    "cdc_latest_state_per_user": QuerySpec(
        "cdc_latest_state_per_user",
        _cdc_latest_state,
        _CDC_ORACLE,
        "changelog compaction: rank-1-per-key latest state (WindowGroupLimit)",
    ),
}
