"""Skew mitigation — salting patterns for hot keys (SURVEY.md §4 /
task brief "skewed keys → salting or AQE skew-join").

`events.event_type` is the canonical skewed domain here: a handful of
distinct values over the whole fact table, so a naive
groupBy(event_type) funnels everything into a few reducer partitions.
Two standard rewrites, both pure plan transformations with results
identical to the naive query (and oracle-checked as such):

- salted aggregation: group by (key, salt) first — the partial
  aggregate fans the hot key across `_N_SALT` reducers — then re-group
  by key to combine. (Spark's own partial/final HashAggregate already
  de-skews COUNT; the explicit two-stage form is the template for
  aggregates whose partial state is large — collect_set, exact
  percentiles — where the map-side combine doesn't save you.)
- salted join: replicate the small/dim side `_N_SALT` times (one copy
  per salt), salt the fact side deterministically, join on
  (key, salt) — each hot-key partition now holds 1/_N_SALT of the
  skewed rows. AQE's skew-join split handles moderate skew at runtime;
  explicit salting is the tool when a single key exceeds what one task
  can ever hold.

Salts are deterministic (event_id % _N_SALT) so the plans stay
reproducible; production would use a round-robin or hash salt, which
changes nothing about the result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

_N_SALT = 16


def salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage (salted) aggregation over the skewed key."""
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", F.col("event_id") % _N_SALT)
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("c"), F.sum("value").cast("decimal(38,6)").alias("v"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("c").alias("n_events"),
            det_round(F.sum("v").cast("double"), 4).alias("sum_value"),
        )
        .orderBy("event_type")
    )


SALTED_COUNTS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       (floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join on the skewed key: dim replicated per salt,
    fact salted deterministically; result set identical to the naive
    equi-join."""
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_tag", F.upper(F.substring("event_type", 1, 3)))
    )
    salts = spark.range(_N_SALT).select(F.col("id").cast("long").alias("salt"))
    dim_replicated = dim.crossJoin(F.broadcast(salts))
    fact = e.withColumn("salt", F.col("event_id") % _N_SALT)
    return (
        fact.join(dim_replicated, ["event_type", "salt"])
        .groupBy("event_type", "type_tag")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


SALTED_JOIN_ORACLE = """
WITH dim AS (
  SELECT DISTINCT event_type, upper(substr(event_type, 1, 3)) AS type_tag
  FROM events
)
SELECT e.event_type, d.type_tag, count(*) AS n_events
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type, d.type_tag
ORDER BY e.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "skew_salted_counts": QuerySpec(
        "skew_salted_counts",
        salted_counts,
        SALTED_COUNTS_ORACLE,
        "two-stage salted aggregation over skewed key",
    ),
    "skew_salted_join": QuerySpec(
        "skew_salted_join",
        salted_join,
        SALTED_JOIN_ORACLE,
        "salted fact-dim join on skewed key",
    ),
}
