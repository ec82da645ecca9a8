"""Exactly-once APPEND sink via batch-addressed idempotent writes.

The upsert sink (`streaming/upsert.py`) gives effectively-once for
KEYED tables — the reference's PK-upsert path
(`flink-jobs/events_postgres_sink.sql:37-57`). This module covers the
other half of the reference's own dichotomy: "no PK ⇒ append mode,
duplicate-key errors on redelivery" (`page_views_postgres_sink.sql:47`).
For append-only sinks (fact logs, archives) there is no key to merge
on, so redelivery protection must come from the WRITE being
idempotent, not the row.

Design — deterministic batch-addressed paths: every micro-batch writes
to `table/batch_id=<id>/` with overwrite mode. Structured Streaming
guarantees a replayed batch carries the SAME batch_id (that is the
checkpoint contract), so a redelivered batch overwrites its own
directory byte-for-byte instead of appending duplicates. Commit-marker
patterns (write a `_SUCCESS`-style ledger entry after the data move)
reduce to the same property; the path-addressed form needs no ledger
because the address IS the idempotency key. This is exactly how
Spark's own file-sink `_spark_metadata` log achieves exactly-once —
re-expressed here for foreachBatch sinks that need custom write logic
(JDBC-style staging, partition reshaping) where the built-in file sink
can't be used.

At 100 TB: one directory per micro-batch is the natural layout for an
append log (compaction — `plans/preprocess.py compact_partitions` —
folds small batch dirs into bounded files downstream); the overwrite
touches only the redelivered batch's files, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def txn_append_sink(table_path: str):
    """foreachBatch callback: idempotent append via batch-addressed
    overwrite. Redelivering (batch_df, batch_id) any number of times
    leaves the table identical to a single delivery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{table_path.rstrip('/')}/batch_id={batch_id}"
        )

    return _sink


def read_append_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the batch-addressed append table (batch_id is a partition
    column carrying write provenance)."""
    return spark.read.option("basePath", table_path).parquet(
        f"{table_path.rstrip('/')}/batch_id=*"
    )
