"""Pipeline observability — the Spark-native analogue of the reference's
Prometheus monitoring.

The reference watches its pipeline from the outside: kafka-exporter →
Prometheus, with rate/lag PromQL (`README.md:79-86`,
`analysis/prometheus.yml:5-8`):

    sum(rate(kafka_topic_partition_current_offset[1m])) by (topic)   # throughput
    sum(kafka_consumergroup_lag) by (consumergroup, topic)           # backlog

Spark surfaces the same two signals from the inside, per micro-batch:
`StreamingQueryProgress.inputRowsPerSecond` / `processedRowsPerSecond`
(throughput) and the source's backlog via `numInputRows` against the
trigger cadence; custom business metrics ride `df.observe(...)` and
arrive in `progress.observedMetrics` — computed ON the executors as an
aggregate piggybacked on the running query, never a second scan.

Two pieces:
- `RateListener` — a `StreamingQueryListener` that accumulates per-batch
  progress (rows, rates, observed metrics) in memory; `throughput()`
  gives the job-lifetime rate, the per-batch list is the scrape surface
  a metrics exporter would poll.
- `observe_ingest(df)` — attaches the standard ingest metric set
  (row count, distinct-key-bearing rows, max event_time) to any
  streaming or batch DataFrame under the well-known name
  ``kfsp_ingest``. For batch, pair with `pyspark.sql.Observation`.

At scale this is the operationally correct design: metrics are
aggregates computed inside the job's own stages (zero extra scans, no
driver collect), and the listener holds only O(batches) scalars.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "kfsp_ingest"


def observe_ingest(df: DataFrame, time_col: str = "event_time") -> DataFrame:
    """Attach the standard ingest metrics as an observation riding the
    query itself (executor-side aggregate, no extra scan). Works on
    streaming DataFrames (metrics appear in every batch's
    `progress.observedMetrics['kfsp_ingest']`)."""
    return df.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("rows"),
        F.max(F.col(time_col)).alias("max_event_time"),
    )


class RateListener(StreamingQueryListener):
    """In-memory per-batch progress accumulator — the scrape surface.

    Collects `(batchId, numInputRows, inputRowsPerSecond,
    processedRowsPerSecond, observedMetrics)` per progress event.
    `total_rows()` and `throughput()` aggregate the job lifetime —
    the Spark-side equivalent of the reference's
    `sum(rate(...current_offset[1m])) by (topic)` PromQL."""

    def __init__(self) -> None:
        self.batches: list[dict[str, Any]] = []

    # QueryStarted/Terminated/Idle are part of the listener ABC
    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        observed = {}
        try:
            om = p.observedMetrics
            if om and OBSERVATION_NAME in om:
                observed = om[OBSERVATION_NAME].asDict()
        except Exception:
            pass  # observedMetrics shape varies when nothing observed
        self.batches.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "observed": observed,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass

    def total_rows(self) -> int:
        return sum(b["num_input_rows"] for b in self.batches)

    def throughput(self) -> float:
        """Lifetime rows/sec over wall-clock spent executing triggers."""
        ms = sum(b["duration_ms"] or 0 for b in self.batches)
        return self.total_rows() / (ms / 1000.0) if ms else 0.0
