"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All plans live in ``kafka_flink_streaming_pipeline_spark/plans`` (and
``operators``); each QuerySpec pairs the Spark builder with its DuckDB
oracle so the two can never drift apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_flink_streaming_pipeline_spark.plans import merged as _merged

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q8 — hourly top-20 documents: scan, relative-time
    filter via broadcast max aggregate, two-phase hash agg, rank window)
    on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _merged()["q8_hourly_top20_24h"].build(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in _merged().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys (oracle=None) are
    genuinely non-SQL-expressible ops → driver runs rows-only check."""
    return {name: spec.oracle for name, spec in _merged().items() if spec.oracle is not None}
