"""Custom streaming source via the Python Data Source API (Spark 4).

The reference's replay producer is a standalone Python process that
walks timestamp-ordered parquet chunks and feeds them to Kafka
(`streaming/kafka_stream_producer.py:242-435`). `replay_stream` models
it with the built-in file source; this module goes one step further
and implements the producer as a FIRST-CLASS Spark source — the
engine-native answer when a stream's transport has no built-in
connector (proprietary queue, REST feed, replay archive):

    register_replay_source(spark)
    df = (spark.readStream.format("clickstream_replay")
          .option("path", chunk_dir).load())

Execution model (the part that matters at scale):
- The driver holds only the OFFSET BOOKKEEPING: an offset is
  ``{"files_consumed": n}`` over the sorted chunk-file list — O(1)
  state, exactly like the Kafka source's partition offsets.
  `latestOffset` releases one file per micro-batch (the
  `maxFilesPerTrigger=1` cadence the replay tests standardize on).
- The DATA moves on executors: `partitions(start, end)` ships one
  `InputPartition` per new file; `read(partition)` opens that parquet
  file with pyarrow ON THE EXECUTOR and yields rows. The driver never
  touches row data — the design constraint that separates a source
  from the reference's driver-side collect anti-pattern (S5).
- Offsets are deterministic over the sorted file list, so checkpoint
  recovery replays exactly the unconsumed suffix; `commit` is a no-op
  because chunk files are immutable.

The class is registered per-SparkSession; `read` runs in the Python
worker with only this file's code (no repo imports inside `read` —
cloudpickle ships the partition object by value).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

#: DDL mirror of sources.streaming.WIRE_SCHEMA (kept literal: the data
#: source is resolved by name in a fresh worker where repo imports may
#: be unavailable).
_WIRE_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


class _ChunkPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._dir = options["path"]
        self._files_per_batch = int(options.get("filesPerBatch", "1"))

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self._dir, "*.parquet")))

    def initialOffset(self) -> dict:
        return {"files_consumed": 0}

    def latestOffset(self) -> dict:
        # release up to filesPerBatch new files per micro-batch — the
        # replay cadence; a file that appears later is picked up by a
        # later trigger (watch-directory semantics)
        return {"files_consumed": len(self._files())}

    def partitions(self, start: dict, end: dict) -> list[_ChunkPartition]:
        files = self._files()
        return [
            _ChunkPartition(p)
            for p in files[start["files_consumed"] : end["files_consumed"]]
        ]

    def read(self, partition: _ChunkPartition) -> Iterator[tuple]:
        # executor-side: stream record batches, never materialize the file
        from datetime import timezone

        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        for batch in pf.iter_batches(columns=cols):
            columns = []
            for c in cols:
                vals = batch.column(c).to_pylist()
                if c == "ts":
                    # parquet ts is naive; the Arrow return path needs
                    # tz-aware values (session TZ is pinned to UTC)
                    vals = [
                        v.replace(tzinfo=timezone.utc) if v is not None else None
                        for v in vals
                    ]
                columns.append(vals)
            yield from zip(*columns)

    def commit(self, end: dict) -> None:
        pass  # chunk files are immutable; nothing to ack

    def deserialize_offset(self, value: str) -> dict:
        return json.loads(value)


class ReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "clickstream_replay"

    def schema(self) -> str:
        return _WIRE_DDL

    def streamReader(self, schema: StructType) -> ReplayStreamReader:
        return ReplayStreamReader(self.options)


#: once-guard for the process-global register_pickle_by_value side effect
_PICKLED_BY_VALUE = False


def register_replay_source(spark) -> None:
    """Register the source with THIS MODULE pickled by value — the same
    cwd-independence fix as `kafka_replay.register_kafka_replay`: the
    engine ships the DataSource class to a Python worker via
    cloudpickle, which serializes module-level classes BY REFERENCE, so
    without this the package must be importable from the Spark app's
    cwd (true under pytest, false for an arbitrary driver).

    GLOBAL SIDE EFFECT (guarded to run once): register_pickle_by_value
    switches ALL cloudpickle serialization touching this module to
    by-value snapshot semantics for the whole process — see
    `kafka_replay.register_kafka_replay` for the full note."""
    global _PICKLED_BY_VALUE
    if not _PICKLED_BY_VALUE:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        _PICKLED_BY_VALUE = True
    spark.dataSource.register(ReplayDataSource)
