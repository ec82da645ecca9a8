"""SparkSession factory with scale-appropriate defaults.

The reference tunes physical execution via config only (SURVEY.md §4):
parallelism = Kafka partition count, 10 s checkpoints, buffered JDBC
sinks. Our analogue is a session pinned to UTC (the reference mixes KST
producer stamps with Flink LTZ semantics — we normalize, FIXTURES.md),
with AQE on so runtime stats re-plan joins/skew at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: ms anchor that converts the Outbrain dataset-relative `timestamp`
#: into absolute event time (reference events_postgres_sink.sql:21).
EPOCH_ANCHOR_MS = 1465876799998


def get_spark(
    app_name: str = "kfsp-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``local[$SPARK_GRAFT_CPUS]`` for tests/bench; on a real cluster the
    master comes from spark-submit and these configs still apply.
    AQE handles runtime join-strategy selection and skew splitting, which
    is what makes the same plans viable from sf0.001 up to 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    active = SparkSession.getActiveSession()
    if active is None:
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
