"""Aggregated query registry for the operator extension modules."""

from __future__ import annotations

from kafka_flink_streaming_pipeline_spark.operators import (
    asof,
    bpe,
    corpus,
    curation,
    datasets,
    interval_join,
    dedup,
    linalg,
    multimodal,
    packing,
    similarity,
    sketches,
    skew,
    text,
)
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
for _mod in (
    text,
    bpe,
    dedup,
    similarity,
    multimodal,
    packing,
    skew,
    curation,
    asof,
    interval_join,
    linalg,
    datasets,
    corpus,
    sketches,
):
    for _k, _v in _mod.QUERIES.items():
        assert _k not in QUERIES, f"duplicate operator query {_k}"
        QUERIES[_k] = _v
