"""Sinks (reference S3/S4/S7/S11 — SURVEY.md §2.1).

The keyed upsert (S3/S7 analogue) lives in `streaming.upsert`; this
module holds the external-system writers. Kafka and JDBC are
option-for-option mappings of the reference's connector configs; they
need a broker/database to run, so they're code paths with gated
execution, not covered by the oracle suite (the wire *format* is —
plans.feature_store.kafka_wire_frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_kafka(
    df: DataFrame,
    topic: str,
    brokers: str = "localhost:9092",
    key_col: str = "key",
    value_col: str = "value",
):
    """S11: batch/stream write to Kafka, mirroring the reference
    producer's batching knobs (kafka_config.yml:7-24 — 128 KB batches,
    50 ms linger, lz4, acks=1)."""
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    writer = (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.batch.size", str(128 * 1024))
        .option("kafka.linger.ms", "50")
        .option("kafka.compression.type", "lz4")
        .option("kafka.acks", "1")
    )
    return writer.save()


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    properties: dict[str, str] | None = None,
    batch_size: int = 1000,
) -> None:
    """S3/S7: JDBC upsert analogue of the Flink sink
    (`sink.buffer-flush.max-rows'='1000'` — events_postgres_sink.sql:55).

    Spark's JDBC writer has no ON CONFLICT mode, so production use pairs
    `mode("append")` with a staging table + server-side MERGE, or swaps
    in the keyed-parquet/Delta upsert (streaming.upsert) when the target
    is lake storage. Executed only when a JDBC URL is reachable."""
    (
        df.write.mode("append")
        .option("batchsize", str(batch_size))
        .jdbc(url, table, properties=properties or {})
    )


def merge_statement(
    table: str,
    stage: str,
    cols: list[str],
    keys: list[str],
    matched_condition: str | None = None,
) -> str:
    """The ANSI `MERGE INTO` statement `jdbc_merge_upsert` executes,
    exposed so tests can run the EXACT production string against real
    engines (embedded Derby via JDBC in tests/test_jdbc_live.py; a real
    PostgreSQL 15 server via psql in tests/test_postgres_merge_live.py).
    Identifiers are quoted — valid on any MERGE-capable target.

    `matched_condition` (referencing t/s, e.g. ``s."ord" > t."ord"``)
    makes the update CONDITIONAL — the out-of-order-safe upsert: a
    late-delivered batch cannot overwrite newer state, so correctness
    stops depending on micro-batch arrival order (the guarantee a
    changelog consumer like the reference's Flink sink gets from
    upstream ordering, enforced here in the database instead)."""
    q = '"{}"'.format
    non_keys = [c for c in cols if c not in keys]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
    insert_cols = ", ".join(q(c) for c in cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
    guard = f" AND {matched_condition}" if matched_condition else ""
    return (
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        + (
            f"WHEN MATCHED{guard} THEN UPDATE SET {set_clause} "
            if non_keys
            else ""
        )
        + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def jdbc_merge_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    properties: dict[str, str] | None = None,
    order_col: str | None = None,
    batch_size: int = 1000,
) -> None:
    """S3/S7 live: keyed JDBC upsert via staging table + server-side
    ANSI MERGE — the executable form of the pattern `write_jdbc_upsert`
    documents. Mirrors the reference's Flink upsert sink semantics
    (events_postgres_sink.sql:24-55 — primary-key upsert with
    `sink.buffer-flush.max-rows'='1000'`): last write per key wins.

    Plan shape: the batch is deduped per key (ANSI MERGE rejects
    multiple source matches), bulk-appended into `<table>_stage` via
    Spark's parallel JDBC writer (`batchsize` = the reference's flush
    size), then ONE server-side `MERGE INTO` moves it atomically —
    per-row driver round-trips never happen, and the DB applies the
    upsert as a set operation. Identifiers are quoted, so the statement
    is valid on every MERGE-capable target (PostgreSQL 15+, Derby
    10.11+ — the in-container live test runs on embedded Derby since
    the container ships no network DB).

    Idempotent by construction: re-running the same batch MERGEs the
    same values onto the same keys."""
    from kafka_flink_streaming_pipeline_spark.streaming.upsert import dedupe_latest

    if order_col:
        df = dedupe_latest(df, keys, order_col)
    else:
        df = df.dropDuplicates(keys)
    props = properties or {}
    stage = f"{table}_stage"
    (
        df.write.mode("overwrite")
        .option("batchsize", str(batch_size))
        .option("truncate", "true")
        .jdbc(url, stage, properties=props)
    )
    # when an order column exists, make the UPDATE conditional on it:
    # a redelivered or out-of-order batch can never regress newer state
    guard = f's."{order_col}" > t."{order_col}"' if order_col else None
    merge = merge_statement(table, stage, df.columns, keys, guard)
    spark = df.sparkSession
    jvm = spark._jvm
    if "driver" in props:
        jvm.java.lang.Class.forName(props["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            # first batch: materialize the target with the staging shape
            # (valid on Derby and PostgreSQL; harmless race with other
            # writers — the loser's already-exists error is swallowed)
            st.execute(f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA")
        except Exception:
            pass
        st.execute(merge)
        st.close()
    finally:
        conn.close()


def foreach_partition_kv_writer(
    keys_values: DataFrame, writer_factory, ttl_seconds: int | None = None
):
    """S4/S5 done right: per-partition KV-store writes on executors
    (the reference's redis_sink.py collects to the driver — S5 — which
    SURVEY.md flags as the anti-pattern; `foreachPartition` keeps
    connections and writes distributed).

    `writer_factory` → a callable returning an object with
    `.hset(key, mapping)` and `.close()`; created once per partition.

    `ttl_seconds`: when set, each written key is expired via
    `.expire(key, ttl_seconds)` right after its `.hset` — the
    reference's feature-store design TTLs its keys (600 s user/item,
    300 s global features; `flink-jobs/redis_sink copy.sql:167-168`)
    so a stalled pipeline ages out of serving instead of serving stale
    features forever. Optional so non-expiring stores (or servers
    without EXPIRE) keep the old two-method contract.
    """

    def _write(partition):
        client = writer_factory()
        try:
            for row in partition:
                client.hset(row["redis_key"], mapping=row["redis_hash"])
                if ttl_seconds is not None:
                    client.expire(row["redis_key"], ttl_seconds)
        finally:
            client.close()

    keys_values.foreachPartition(_write)
