"""Keyed upsert sink — the one piece of real engine work (SURVEY.md §4).

Flink infers upsert mode from a PRIMARY KEY on the sink table
(`page_views_postgres_sink.sql:47`: PK ⇒ upsert, no PK ⇒ append +
duplicate-key errors). Spark has no such inference, so we implement
MERGE semantics in `foreachBatch`: each micro-batch is deduplicated on
the key (latest wins) and merged into a keyed parquet table.

Idempotency: re-delivering a batch leaves the table unchanged (new rows
win on identical keys), which is what makes checkpoint-replay
effectively-once — the same property the reference leans on with
PK-upserts into Postgres (README.md:43-47).

Scale notes: the local implementation rewrites the table (fine for
feature tables ≤ memory; the test contract). At 100 TB the same
`merge_upsert` call sites swap in Delta `MERGE INTO` or dynamic
partition overwrite on the key's partition column — the surrounding
job code (sinks receive (batch_df, batch_id)) is unchanged. We keep the
merge relational: anti-join old-vs-new on the key, union — no driver
collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dedupe_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep one row per key — the one with the highest `order_col`
    (ties broken arbitrarily-but-deterministically by the remaining
    columns' row_number order)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def merge_upsert(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    keys: list[str],
    order_col: str,
) -> None:
    """MERGE `batch` into the parquet table at `table_path` on `keys`.

    matched → replace with the batch row (latest wins);
    not matched → insert. Equivalent to Flink's PK-upsert JDBC sink
    (events_postgres_sink.sql:37-57) and to `MERGE INTO t USING b ON
    keys WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`.
    """
    fresh = dedupe_latest(batch, keys, order_col)
    if os.path.exists(table_path):
        current = spark.read.parquet(table_path)
        kept = current.join(fresh.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(fresh)
    else:
        merged = fresh
    # materialize before overwriting the path we just read from
    tmp = table_path.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(table_path)


def upsert_sink(spark: SparkSession, table_path: str, keys: list[str], order_col: str):
    """foreachBatch callback with MERGE semantics (S3/S7 analogue)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(spark, batch_df, table_path, keys, order_col)

    return _sink
