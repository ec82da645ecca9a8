"""Streaming jobs — FP1 raw pass-through and FP2 windowed features
(SURVEY.md §2.11, reference flink-jobs/*).

FP1 (events_postgres_sink.sql:62-73): project the declared columns, add
`act_load_time = current_timestamp()` (the PROCTIME() analogue — stamped
per micro-batch), upsert into the raw table on the event key.

FP2 (redis_sink copy.sql:64-181): per-user 5-minute tumbling click/view
counts. The reference LEFT JOINs two streaming window aggregates; Spark
forbids joining two streaming aggregates, and the idiomatic answer is a
single union-pivot aggregation (conditional counts in one groupBy) —
one stateful operator, one shuffle, identical semantics (J1 analysis in
SURVEY.md). Output mode `update` + keyed upsert sink mirrors Flink's
changelog upsert into Redis: every trigger refines the (uuid,
window_end) row, late rows beyond the 5 s watermark are dropped by the
window operator exactly as Flink drops them.

State at scale: per-(user, 5-min-window) counters, evicted when the
watermark passes — bounded by active users per window, not by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_flink_streaming_pipeline_spark.functions import redis_feature_key
from kafka_flink_streaming_pipeline_spark.streaming.upsert import upsert_sink


def raw_passthrough(stream: DataFrame) -> DataFrame:
    """FP1 projection: declared columns + act_load_time (P1/P2/F2)."""
    return stream.select(
        "event_id",
        "user_id",
        "event_type",
        "event_time",
        "value",
        "props",
        F.current_timestamp().alias("act_load_time"),
    )


def raw_sink_job(stream: DataFrame, table_path: str, checkpoint: str) -> StreamingQuery:
    """FP1 end-to-end: pass-through projection upserted on event_id —
    the S3 JDBC-upsert analogue, idempotent under redelivery."""
    spark = stream.sparkSession
    return (
        raw_passthrough(stream)
        .writeStream.outputMode("append")
        .foreachBatch(upsert_sink(spark, table_path, ["event_id"], "act_load_time"))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def user_features_5m(stream: DataFrame) -> DataFrame:
    """FP2 as union-pivot single aggregation over the streamed events.

    Emits (uuid, window_end, click5m, view5m, redis_key) — the same
    row set as the reference's click-agg ⟕ view-agg (clicks > 0 filter
    applied in the sink query, mirroring the LEFT side preservation).
    """
    return (
        stream.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.col("user_id").alias("uuid"),
            F.window("event_time", "5 minutes").alias("w"),
        )
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("click5m"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("view5m"),
        )
        .filter(F.col("click5m") > 0)
        .select(
            "uuid",
            F.col("w.end").alias("window_end"),
            "click5m",
            "view5m",
            redis_feature_key(F.col("uuid"), F.col("w.end")).alias("redis_key"),
        )
    )


def feature_stream_job(stream: DataFrame, table_path: str, checkpoint: str) -> StreamingQuery:
    """FP2 end-to-end: windowed features upserted on (uuid, window_end)
    each trigger — the Redis HSET sink analogue (S4), keyed exactly like
    `feat:user:{uuid}:yyyyMMddHHmm`."""
    spark = stream.sparkSession
    feats = user_features_5m(stream)
    return (
        feats.withColumn("batch_seq", F.lit(0).cast("long"))
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: upsert_sink(
                spark, table_path, ["uuid", "window_end"], "batch_seq"
            )(df.withColumn("batch_seq", F.lit(bid)), bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
