"""PySpark-native analytics engine with the query surface of
DS-argus/kafka-flink-streaming-pipeline.

The reference composes Flink SQL / PyFlink / Postgres SQL into a
clickstream feature pipeline (see SURVEY.md). This package re-expresses
that entire query surface — sources, windowed feature pipelines, the nine
analytical queries, upsert sinks — as idiomatic Spark DataFrame / SQL /
Structured Streaming plans, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Design rules (enforced throughout):
- DataFrame/SQL only; no RDDs; no driver-side collect loops in operators.
- Relative-time filters use a broadcast 1-row max-timestamp aggregate
  (reference pattern `flink-analysis.sql:13-17`), which Catalyst turns
  into a BroadcastNestedLoopJoin over a single row — partition-prunable.
- Window aggregations use `F.window` (two-phase hash agg, map-side
  partial) instead of per-key driver logic.
- Small dimensions are broadcast; big joins rely on AQE + shuffle hash.
- Python stays out of the hot path: the parity surface needs zero UDFs
  (SURVEY.md §2.10); extensions use Arrow-batched pandas UDFs only where
  built-ins genuinely cannot express the op.
"""

from kafka_flink_streaming_pipeline_spark.session import get_spark


def list_queries() -> list[str]:
    """Names of every registered query/operator (SURVEY.md §2 surface +
    training-data extensions)."""
    from kafka_flink_streaming_pipeline_spark.plans import merged

    return sorted(merged())


def run_query(spark, name: str, sf_dir: str = "/root/testdata/sf0.001"):
    """Build one registered query against a testdata directory; returns
    the (lazy) DataFrame."""
    from kafka_flink_streaming_pipeline_spark.plans import merged

    specs = merged()
    if name not in specs:
        raise KeyError(f"unknown query {name!r}; see list_queries()")
    return specs[name].build(spark, sf_dir)


__all__ = ["get_spark", "list_queries", "run_query"]
