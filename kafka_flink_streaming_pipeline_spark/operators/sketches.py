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
events table. Estimates are deterministic (hash-based, no RNG) but
algorithm-specific, so there is no DuckDB oracle: the driver runs the
rows-only check and `tests/test_components_property.py` bounds the
estimate against the exact distinct (HLL lgK=12 → ~1.6% standard
error; we assert 5%) and proves merge == sketch-of-union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

_LG_K = 12


def sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type HLL sketch rollup + merged 'ALL' row (see module doc)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"),
        F.count("*").alias("rows"),
    )
    merged = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_union_agg("sk").alias("sk"),
        F.sum("rows").alias("rows"),
    )
    return (
        per_type.unionByName(merged)
        .select(
            "event_type",
            "rows",
            F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        )
        .orderBy("event_type")
    )


QUERIES: dict[str, QuerySpec] = {
    "sketch_rollup_active_users": QuerySpec(
        "sketch_rollup_active_users",
        sketch_rollup,
        None,  # DataSketches estimates have no cross-engine oracle
        "HLL sketch rollup: per-group sketches + union-merged ALL row, no fact re-scan",
    ),
}
