"""Preprocessing plans (reference notebooks/preprocess.ipynb — S8/S9,
P5/P6, F18, O3).

The reference notebook cleans the raw CSV (drop rows whose platform is
not in the valid set, CASE-repair `\\N` platforms by display_id list),
derives `event_date`, then writes parquet partitioned by
`(platform, event_date)` with rows sorted by timestamp *via a driver
loop over distinct partition pairs with coalesce(1)* — cell 11.

Here the cleaning is one declarative projection (oracle-checked), and
the writer is the idiomatic one-job version: `repartition(keys) →
sortWithinPartitions → write.partitionBy(keys)` — no driver loop, one
shuffle, scales to any partition count (SURVEY.md S9 note). The writer
is exercised in tests/test_sources.py (partition pruning + sortedness,
mirroring the notebook's manual check in cell 13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table


def clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 membership-negation filter + P6 CASE value repair + F18
    to_date, as one projection."""
    e = load_table(spark, sf_dir, "events")
    platform = (F.col("user_id") % 4).cast("int")
    return (
        e.filter(~F.col("event_type").isin("error"))  # P5: drop invalid rows
        .select(
            "event_id",
            F.col("user_id").alias("uuid"),
            "event_type",
            F.col("ts").alias("event_time"),
            # P6: repair invalid platform 0 → 1 (the notebook patches
            # '\\N' platforms to a valid id by key list)
            F.when(platform == 0, F.lit(1)).otherwise(platform).alias("platform"),
            F.to_date("ts").alias("event_date"),
        )
    )


CLEAN_EVENTS_ORACLE = """
SELECT event_id,
       user_id AS uuid,
       event_type,
       ts AS event_time,
       CAST(CASE WHEN user_id % 4 = 0 THEN 1 ELSE user_id % 4 END AS INT) AS platform,
       CAST(ts AS DATE) AS event_date
FROM events
WHERE event_type NOT IN ('error')
"""


def write_partitioned(df: DataFrame, out_dir: str) -> None:
    """S9/O3 idiomatic form: one job, partitioned layout, ts-sorted
    within each file — replaces the notebook's per-partition driver
    loop + coalesce(1)."""
    (
        df.repartition("platform", "event_date")
        .sortWithinPartitions("event_time")
        .write.mode("overwrite")
        .partitionBy("platform", "event_date")
        .parquet(out_dir)
    )


def compact_partitions(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    partition_cols: list[str],
    sort_col: str,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Small-files compaction: rewrite a partitioned table so each
    partition holds the fewest files of bounded size.

    The operational fix for the 100 TB small-files problem — streaming
    ingest and fine-grained upserts leave thousands of KB-sized files
    per partition; every later scan then pays per-file open/footer
    costs and the NameNode/listing pays the metadata. One declarative
    job: repartition on the partition keys (each output partition is
    written by one task → one file per `max_records_per_file` rows),
    re-sort within partitions so min/max stats stay tight for row-group
    skipping, and let the writer split at the record cap. This is the
    same shape `OPTIMIZE` runs on lakehouse tables; on Delta the call
    site becomes `OPTIMIZE ... ZORDER BY`."""
    (
        spark.read.parquet(table_dir)
        .repartition(*partition_cols)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )


def read_evolving_appends(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read an append table whose batches were written under EVOLVING
    schemas: `mergeSchema` unions the per-file parquet schemas, so rows
    from before a column existed surface it as NULL and every reader
    sees the superset schema. The schema-drift half of the ingest
    contract the reference never faces (its Flink DDLs are frozen;
    a year-long 100 TB ingest is not): producers ADD columns over time
    and old data must stay readable without rewrite. Columns may only
    be added, never retyped — parquet merge fails on true type
    conflicts, which is the correct loud failure. Per-file footers are
    merged on the executors (a distributed read of footers, not data);
    pin the merged schema in the catalog for steady-state reads so the
    merge cost is paid once, not per query."""
    return spark.read.option("mergeSchema", "true").parquet(table_dir)


def _clean_events_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    # string-formatted variants for cross-engine value hashing
    df = clean_events(spark, sf_dir)
    return df.select(
        "event_id",
        "uuid",
        "event_type",
        F.date_format("event_time", "yyyy-MM-dd HH:mm:ss").alias("event_time"),
        "platform",
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
    ).orderBy("event_id")


CLEAN_EVENTS_STR_ORACLE = """
SELECT event_id,
       user_id AS uuid,
       event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
       CAST(CASE WHEN user_id % 4 = 0 THEN 1 ELSE user_id % 4 END AS INT) AS platform,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date
FROM events
WHERE event_type NOT IN ('error')
ORDER BY event_id
"""


QUERIES: dict[str, QuerySpec] = {
    "preprocess_clean_events": QuerySpec(
        "preprocess_clean_events",
        _clean_events_str,
        CLEAN_EVENTS_STR_ORACLE,
        "isin-negation filter + CASE repair + to_date (P5/P6/F18)",
    ),
}
