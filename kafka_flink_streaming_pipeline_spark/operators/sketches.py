"""Mergeable sketch columns — the 100 TB pre-aggregation pattern.

Exact COUNT(DISTINCT) re-scans the fact table for every question; at
warehouse scale the standard answer is a ROLLUP TABLE whose rows carry
*mergeable sketches* (Apache DataSketches HLL, built into Spark 4 as
`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`): build one
sketch per (group) once, then answer any union of groups by merging
sketches — no fact re-scan, register-wise max is commutative and
associative so merge order (and therefore partitioning) cannot change
the estimate.

The reference's only distinct-count is exact over Postgres
(`analysis/flink-analysis.sql:146,226-227`); its streaming ⊘ variant
is the place this pattern would land in production (SURVEY §2.4 A6).

`sketch_rollup_active_users` is the full pattern in one plan:
per-event-type sketch rows (the persisted rollup table) plus an 'ALL'
row computed by MERGING the per-type sketches — never re-touching the
events table for the estimate. Estimates are deterministic (hash-based,
no RNG) but algorithm-specific, so the raw estimate has no cross-engine
oracle. The HASHABLE contract is therefore the ACCURACY CLAIM: the
output carries per-group rows, the exact distinct, and a boolean
`within_5pct` (|estimate−exact|/exact ≤ 0.05 — HLL lgK=12 has ~1.6%
standard error, so 5% is a safe bound); DuckDB computes the same exact
counts and asserts TRUE. The estimate itself stays internal to the
boolean. The exact countDistinct is the oracle-side contract only — in
production the whole point is that the sketch rollup replaces it.
`tests/test_components_property.py` additionally proves merge ==
sketch-of-union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

_LG_K = 12


def sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type HLL sketch rollup + merged 'ALL' row (see module doc).

    Output contract (driver-hashable): (event_type, n_rows, exact_users,
    within_5pct). `exact_users` exists so DuckDB can reproduce the row;
    the sketch estimate feeds only the `within_5pct` accuracy boolean.
    The 'ALL' estimate comes from MERGING per-type sketches (the rollup
    pattern), never from re-sketching the fact table.

    ONE fact scan total: the events table collapses to the distinct
    (event_type, user_id) relation first (map-side combinable, carries
    the raw row count), and BOTH the sketches and the exact oracle
    columns derive from that small relation — HLL registers are
    duplicate-insensitive, so sketching the distinct pairs is
    bit-identical to sketching the raw stream. Earlier shape re-scanned
    events for the ALL-row exact (crossJoin), so the benchmarked
    HEADLINE timing measured the exact aggregate the sketch pattern
    exists to avoid."""
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        # eager localCheckpoint: the relation feeds three consumers
        # (sketch rows, ALL-row merge, exact-ALL distinct) — without
        # materialization the one output job would re-scan the fact
        # table once per consumer; |types|x|users| rows is tiny
        .localCheckpoint()
    )
    per_type = pairs.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"),
        F.sum("n").alias("n_rows"),
        F.count("*").alias("exact_users"),
    )
    merged = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_rows").alias("n_rows"),
    ).crossJoin(
        F.broadcast(pairs.agg(F.countDistinct("user_id").alias("exact_users")))
    )
    est = F.hll_sketch_estimate("sk").cast("double")
    return (
        per_type.select("event_type", "sk", "n_rows", "exact_users")
        .unionByName(merged.select("event_type", "sk", "n_rows", "exact_users"))
        .select(
            "event_type",
            "n_rows",
            "exact_users",
            (
                F.abs(est - F.col("exact_users")) / F.col("exact_users") <= F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


SKETCH_ROLLUP_ORACLE = """
SELECT event_type, count(*) AS n_rows,
       count(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
FROM events GROUP BY 1
UNION ALL
SELECT 'ALL', count(*), count(DISTINCT user_id), TRUE FROM events
ORDER BY event_type
"""


# --- count-min sketch heavy hitters ----------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row
_CMS_TOPK = 20


def _cms_bucket_expr(i: int, key):
    """Row-i CMS bucket for a key: 32 md5 bits → [0, w). Same bytes in
    both engines, so the sketch is oracle-checkable (unlike HLL)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 8), 16, 10)
        .cast("long")
        % _CMS_W
    )


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """The count-min sketch as a RELATION: (row_i, bucket, cnt), d×w
    rows total regardless of input cardinality (Cormode & Muthukrishnan,
    J. Algorithms 2005). The d-way expansion is a map-side generator and
    the partial aggregate collapses each partition to ≤ d·w rows before
    the one shuffle — the sketch of a 100 TB table is 1024 rows.
    Counters are plain sums, so sketches MERGE by element-wise addition
    (union of shards ≡ sketch of union, exactly — proven in
    tests/test_components_property.py)."""
    key = F.col(key_col).cast("string")
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("row_i"), _cms_bucket_expr(i, key).alias("bucket"))
            for i in range(_CMS_D)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy("p.row_i", "p.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters from the count-min sketch: estimate(u) =
    min over rows of counter[row_i][h_i(u)] (point query), compared
    against the exact per-user count. The probe side joins the D×W
    counter relation (broadcast — it is 1024 rows at ANY scale) instead
    of re-scanning the fact table; ranked by the ESTIMATE, which is what
    a production system has when the exact rollup is too big to keep.
    CMS guarantees est ≥ exact always and est ≤ exact + εN w.h.p. —
    both visible in the output (overestimate column)."""
    ev = load_table(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    key = F.col("user_id").cast("string")
    probes = exact.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), _cms_bucket_expr(i, key).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", "p.row_i", "p.bucket")
    est = (
        probes.join(F.broadcast(cms), ["row_i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy(F.desc("cms_est"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )


SKETCH_CMS_ORACLE = f"""
WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
cms AS (
  SELECT p.row_i,
         CAST(('0x' || substr(md5(p.row_i || ':' || k), 1, 8)) AS BIGINT)
           % {_CMS_W} AS bucket,
         count(*) AS cnt
  FROM keyed CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS row_i) p
  GROUP BY 1, 2
),
exact AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k, count(*) AS exact_n
          FROM events GROUP BY 1, 2),
probes AS (
  SELECT e.user_id, e.exact_n, p.row_i,
         CAST(('0x' || substr(md5(p.row_i || ':' || e.k), 1, 8)) AS BIGINT)
           % {_CMS_W} AS bucket
  FROM exact e CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS row_i) p
),
est AS (
  SELECT user_id, exact_n, min(cnt) AS cms_est
  FROM probes JOIN cms USING (row_i, bucket)
  GROUP BY user_id, exact_n
)
SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overestimate
FROM est
ORDER BY cms_est DESC, user_id
LIMIT {_CMS_TOPK}
"""


# --- bottom-k (KMV-style) quantile sketch ----------------------------------

_BK = 64  # sample rows kept per group


def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-group quantile sketch via a deterministic BOTTOM-K
    sample: keep the k rows with the smallest md5(key) per group (the
    k-minimum-values idea — Bar-Yossef et al., RANDOM 2002 — applied as
    a uniform sampler), then read quantiles off the sample.

    Two properties make this the 100 TB rollup pattern:
    - MERGEABLE: bottom-k of a union == bottom-k of the concatenated
      per-shard bottom-k's (min-rank rows survive any merge order) —
      proven in `test_bottomk_sketch_merge_equals_direct`.
    - DETERMINISTIC: the md5 ranking is a pure function of the key, so
      unlike reservoir/rand() sampling the sketch — and therefore every
      estimate — is exactly reproducible cross-engine; the oracle
      checks est AND exact to equality, no tolerance needed.

    Plan: the per-group top-k rank filter compiles to WindowGroupLimit
    (partial top-k per partition before the shuffle), so the sketch
    build never materializes a full per-group sort."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
        F.md5(F.col("o_orderkey").cast("string")).alias("rk"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("rk", "o_orderkey")
    samp = keyed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _BK)
    est = samp.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY price)").alias("est_p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY price)").alias("est_p90"),
        F.count("*").alias("sample_n"),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE))"
        ).alias("exact_p50"),
        F.count("*").alias("n_rows"),
    )
    return (
        est.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority", "n_rows", "sample_n",
            "est_p50", "est_p90", "exact_p50",
        )
        .orderBy("o_orderpriority")
    )


SKETCH_BOTTOMK_ORACLE = f"""
WITH keyed AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price,
         md5(CAST(o_orderkey AS VARCHAR)) AS rk, o_orderkey
  FROM orders
),
samp AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY rk, o_orderkey) AS rn
    FROM keyed
  ) WHERE rn <= {_BK}
),
est AS (
  SELECT o_orderpriority,
         quantile_disc(price, 0.5) AS est_p50,
         quantile_disc(price, 0.9) AS est_p90,
         count(*) AS sample_n
  FROM samp GROUP BY 1
),
exact AS (
  SELECT o_orderpriority,
         quantile_disc(CAST(o_totalprice AS DOUBLE), 0.5) AS exact_p50,
         count(*) AS n_rows
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n_rows, sample_n, est_p50, est_p90, exact_p50
FROM est JOIN exact USING (o_orderpriority)
ORDER BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_bottomk_quantiles": QuerySpec(
        "sketch_bottomk_quantiles",
        sketch_bottomk_quantiles,
        SKETCH_BOTTOMK_ORACLE,
        "deterministic bottom-k (KMV) sample quantiles per group, "
        "merge-closed and exactly cross-engine reproducible",
    ),
    "sketch_cms_heavy_hitters": QuerySpec(
        "sketch_cms_heavy_hitters",
        sketch_cms_heavy_hitters,
        SKETCH_CMS_ORACLE,
        "count-min sketch point queries: estimate-ranked heavy hitters vs exact",
    ),
    "sketch_rollup_active_users": QuerySpec(
        "sketch_rollup_active_users",
        sketch_rollup,
        SKETCH_ROLLUP_ORACLE,  # the hashable contract is the accuracy claim
        "HLL sketch rollup: per-group sketches + union-merged ALL row; "
        "hashable via exact counts + within_5pct accuracy boolean",
    ),
}
