"""Query plan registry.

Each plan module exposes ``QUERIES: dict[str, QuerySpec]``; this package
merges them into ``ALL_QUERIES`` which `__spark_entry__.py` re-exports to
the driver. A QuerySpec pairs the Spark DataFrame builder with the
equivalent DuckDB oracle SQL (None for ops that genuinely aren't
SQL-expressible — the driver then records a rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    desc: str = ""


def merged() -> dict[str, QuerySpec]:
    from kafka_flink_streaming_pipeline_spark.plans import (
        analytics,
        clickstream,
        feature_store,
        olap,
        preprocess,
        profiling,
        stateful_stream,
        tpch,
        tpch_deep,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        clickstream,
        tpch,
        tpch_deep,
        olap,
        analytics,
        profiling,
        feature_store,
        preprocess,
        stateful_stream,
    ):
        for k, v in mod.QUERIES.items():
            assert k not in out, f"duplicate query name {k}"
            out[k] = v
    try:
        from kafka_flink_streaming_pipeline_spark.operators import registry as op_registry

        for k, v in op_registry.QUERIES.items():
            assert k not in out, f"duplicate query name {k}"
            out[k] = v
    except ImportError:
        pass
    return out
