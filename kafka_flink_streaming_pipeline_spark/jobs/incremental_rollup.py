"""Incremental rollup maintenance — don't recompute history.

The reference's daily batch job recomputes its whole processing day
from Postgres every run (`airflow/dags/20m_feature_update.py`,
`flink-jobs/feature_batch_update.py:85-113`) — fine for one day, fatal
at 100 TB where "the rollup" spans years. The warehouse-scale pattern
is INCREMENTAL VIEW MAINTENANCE over a partitioned rollup table:

- the rollup is parquet partitioned by the grouping date;
- an update run reads ONLY the affected fact dates (partition-pruned
  scan), recomputes exactly those rollup partitions, and writes them
  with dynamic partition overwrite — untouched history is never read
  or rewritten;
- re-running a day is idempotent (overwrite of the same partitions),
  which is what makes retry-on-failure safe — the same property the
  reference gets from PK upserts.

`update_rollup(dates)` is the maintenance step; equivalence with a
full recompute and idempotent redelivery are proven in
`tests/test_stateful_unit.py::test_incremental_rollup_equals_full_recompute`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_frame(events: DataFrame) -> DataFrame:
    """The rollup definition: daily per-type activity. The value sum is
    integer CENTS (per-row floor(value·100 + 0.5), summed as BIGINT) —
    the repo's micro-unit discipline: IEEE floor/multiply are primitive-
    identical across engines, whereas double→DECIMAL casts round on
    engine-specific decimal expansions (Spark HALF_UP on the shortest
    repr vs DuckDB on the exact binary), which a value hash would
    catch."""
    return events.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("value_cents"),
        F.count_distinct("user_id").alias("users"),
    )


def update_rollup(
    spark: SparkSession, events: DataFrame, rollup_path: str, dates: list
) -> None:
    """Incrementally maintain the rollup for `dates` only: prune the
    fact scan to those dates, recompute their rollup rows, overwrite
    exactly those partitions (dynamic partition overwrite — history is
    neither read nor rewritten). Idempotent per date set."""
    # prefer a physical `d` partition column when the fact table has
    # one: the filter then prunes PARTITIONS at the scan (the whole
    # point of incremental maintenance at 100 TB); otherwise derive
    # the date from ts (still a pushed-down predicate, full scan)
    key = F.col("d") if "d" in events.columns else F.to_date("ts")
    affected = events.filter(key.isin([str(d) for d in dates]))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rollup_frame(affected).write.mode("overwrite").partitionBy("d").parquet(
            rollup_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path)
