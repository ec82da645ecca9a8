"""Connector option contract vs the reference DDL (r6 verdict ask #3).

The container ships no Kafka broker or Postgres, so the live connector
paths (`kafka_stream`, `write_jdbc_upsert`) are structurally untestable
here — the replay/parquet twins carry the runtime semantics. What CAN
be pinned is the CONTRACT: the reference declares its connector wiring
as Flink DDL option strings (`flink-jobs/events_postgres_sink.sql`),
and our builders mirror those options. This test parses the reference
DDL and asserts each mirrored value against our code and constants, so
drift on EITHER side (a reference re-read changing an assumption, or a
refactor silently dropping an option) fails textually instead of
surfacing in a production deploy.

Skips (not fails) when the reference checkout is absent — the contract
is against the reference tree, not against this repo alone.
"""

from __future__ import annotations

import inspect
import re
from pathlib import Path

import pytest

_REF_SQL = Path("/root/reference/flink-jobs/events_postgres_sink.sql")

pytestmark = pytest.mark.skipif(
    not _REF_SQL.exists(), reason="reference checkout not present"
)


def _options(block: str) -> dict[str, str]:
    """Parse Flink DDL `'key' = 'value'` option pairs from a WITH block."""
    return dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", block))


@pytest.fixture(scope="module")
def ddl() -> str:
    return _REF_SQL.read_text()


@pytest.fixture(scope="module")
def source_opts(ddl) -> dict[str, str]:
    m = re.search(r"CREATE TABLE events_src.*?WITH\s*\((.*?)\);", ddl, re.S)
    assert m, "reference DDL lost its events_src block"
    return _options(m.group(1))


@pytest.fixture(scope="module")
def sink_opts(ddl) -> dict[str, str]:
    m = re.search(r"CREATE TABLE events_sink.*?WITH\s*\((.*?)\);", ddl, re.S)
    assert m, "reference DDL lost its events_sink block"
    return _options(m.group(1))


def test_kafka_source_options_mirrored(source_opts):
    """events_postgres_sink.sql:24-31 ↔ sources/streaming.kafka_stream:
    connector kind, topic, offset policy, and format must all map."""
    from kafka_flink_streaming_pipeline_spark.sources.streaming import (
        kafka_stream,
    )

    assert source_opts["connector"] == "kafka"
    assert source_opts["format"] == "json"
    assert source_opts["topic"] == "events"
    # Flink consumes from committed group offsets, falling back to
    # earliest for a fresh group; Spark's equivalent fresh-start policy
    # is startingOffsets=earliest (checkpoint offsets take over after)
    assert source_opts["scan.startup.mode"] == "group-offsets"
    assert source_opts["properties.auto.offset.reset"] == "earliest"

    from kafka_flink_streaming_pipeline_spark.sources.streaming import (
        parse_kafka_frame,
    )

    src = inspect.getsource(kafka_stream)
    sig = inspect.signature(kafka_stream)
    assert '"kafka"' in src and '"subscribe"' in src
    assert '"kafka.bootstrap.servers"' in src
    assert sig.parameters["starting_offsets"].default == "earliest"
    # the 'format'='json' mapping lives in the shared decode stage,
    # which kafka_stream must route through (the same function the
    # live kafka_replay wire twin exercises)
    assert "parse_kafka_frame(" in src
    assert "from_json" in inspect.getsource(parse_kafka_frame)


def test_event_time_anchor_and_watermark_mirrored(ddl):
    """The computed event_time (`TO_TIMESTAMP_LTZ(ts + 1465876799998,
    3)`) and the 5-second watermark are part of the source contract."""
    from kafka_flink_streaming_pipeline_spark.session import EPOCH_ANCHOR_MS
    from kafka_flink_streaming_pipeline_spark.sources.streaming import (
        kafka_stream,
    )

    m = re.search(r"TO_TIMESTAMP_LTZ\(`timestamp` \+ (\d+), 3\)", ddl)
    assert m and int(m.group(1)) == EPOCH_ANCHOR_MS

    m = re.search(r"WATERMARK FOR event_time AS event_time - INTERVAL '(\d+)' SECOND", ddl)
    assert m
    sig = inspect.signature(kafka_stream)
    assert sig.parameters["watermark"].default == f"{m.group(1)} seconds"


def test_jdbc_sink_options_mirrored(sink_opts, ddl):
    """events_postgres_sink.sql:48-57 ↔ sinks.write_jdbc_upsert: the
    flush batch size maps to Spark's JDBC `batchsize`, and the upsert
    key set matches the declared PRIMARY KEY."""
    from kafka_flink_streaming_pipeline_spark.sinks import write_jdbc_upsert

    assert sink_opts["connector"] == "jdbc"
    assert sink_opts["table-name"] == "events"
    flush_rows = int(sink_opts["sink.buffer-flush.max-rows"])
    sig = inspect.signature(write_jdbc_upsert)
    assert sig.parameters["batch_size"].default == flush_rows

    src = inspect.getsource(write_jdbc_upsert)
    assert '"batchsize"' in src  # the max-rows mapping is actually applied

    pk = re.search(r"PRIMARY KEY \(([^)]*)\) NOT ENFORCED", ddl)
    assert pk and [c.strip() for c in pk.group(1).split(",")] == [
        "uuid",
        "display_id",
    ]
