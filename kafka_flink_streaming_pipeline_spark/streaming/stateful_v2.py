"""Custom stateful streaming operator on the Spark 4 state-v2 API:
30-min-idle sessionization via `transformWithStateInPandas`.

Same semantics as streaming/stateful.py (the applyInPandasWithState
formulation, SURVEY.md §2.9 T9): a session closes when the gap since
the previous event exceeds the idle timeout, with exact start/end and
event + click counts. This module re-expresses it on the
current-generation API, which is where Spark's custom stateful
development now happens:

- TYPED STATE HANDLES: the open session is a named ValueState with a
  declared schema (state-v2 supports value/list/map states per key,
  TTL, and schema evolution across restarts — applyInPandasWithState
  offers one opaque tuple);
- EXPLICIT TIMERS: `registerTimer` + `handleExpiredTimer` replace the
  single implicit timeout — one processor can hold many timers; stale
  timers (a session extended after registration) are detected by
  re-deriving the expiry from current state and ignored;
- RocksDB state store REQUIRED: state-v2 runs only on the RocksDB
  provider (changelog-checkpointed, spillable) — the store one would
  pick for 100 TB keyed state anyway; the job function pins the conf.

The processor class is defined inside a factory so cloudpickle
serializes it BY VALUE — executors do not have this repo on sys.path
(the same driver-contract constraint as every distributed closure
here).

ENVIRONMENT GAP: transformWithState's Python workers talk to the JVM
state server over protobuf, and this container's Python has no
`google.protobuf` (installs are off-limits) — so the equivalence test
(`test_stateful_v2_sessionizer_matches_batch_lag`) self-skips here,
exactly like the Kafka-connector plan test. The v1 operator in
streaming/stateful.py runs the same semantics end-to-end in this
container and is the tested path; this module is the forward path
where protobuf is present.

At 100 TB the costs are identical to the v1 operator: one hash
exchange on user_id, Arrow-batched Python, ~32 bytes of state per
concurrently-open session, state and timers evicted by watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.streaming.stateful import SESSION_SCHEMA

_STATE_DDL = "start_us LONG, last_us LONG, n_events LONG, n_clicks LONG"


def _make_session_processor(gap_ms: int):
    """Factory returning a StatefulProcessor instance (closure-defined
    class so it pickles by value)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_ms * 1000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open_session", _STATE_DDL)

        def _emit(self, start_us, last_us, n, clicks, uuid):
            import pandas as pd

            return pd.DataFrame(
                {
                    "uuid": [uuid],
                    "session_start": [pd.Timestamp(int(start_us), unit="us")],
                    "session_end": [pd.Timestamp(int(last_us), unit="us")],
                    "n_events": [int(n)],
                    "n_clicks": [int(clicks)],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            pdf = pd.concat(list(rows), ignore_index=True)
            if len(pdf) == 0:
                return
            pdf = pdf.sort_values(["event_time", "event_id"])
            ts = pdf["event_time"].to_numpy().astype("datetime64[us]").astype("int64")
            clicks_v = (pdf["event_type"] == "click").to_numpy()

            if self._open.exists():
                cur_start, cur_last, cur_n, cur_clicks = self._open.get()
            else:
                cur_start, cur_last, cur_n, cur_clicks = None, None, 0, 0

            out = []
            seg_from = 0
            for i in range(len(ts)):
                prev = ts[i - 1] if i > 0 else cur_last
                if prev is not None and ts[i] - prev > gap_us:
                    if i > seg_from or cur_start is None:
                        seg = slice(seg_from, i)
                        if cur_start is not None:
                            out.append(
                                (
                                    cur_start,
                                    ts[i - 1],
                                    cur_n + (i - seg_from),
                                    cur_clicks + int(clicks_v[seg].sum()),
                                )
                            )
                        elif i > seg_from:
                            out.append(
                                (
                                    ts[seg_from],
                                    ts[i - 1],
                                    i - seg_from,
                                    int(clicks_v[seg].sum()),
                                )
                            )
                    else:
                        out.append((cur_start, cur_last, cur_n, cur_clicks))
                    cur_start, cur_last, cur_n, cur_clicks = None, None, 0, 0
                    seg_from = i

            tail = slice(seg_from, len(ts))
            if cur_start is None:
                new_state = (
                    int(ts[seg_from]),
                    int(ts[-1]),
                    len(ts) - seg_from,
                    int(clicks_v[tail].sum()),
                )
            else:
                new_state = (
                    int(cur_start),
                    int(ts[-1]),
                    cur_n + (len(ts) - seg_from),
                    cur_clicks + int(clicks_v[tail].sum()),
                )
            self._open.update(new_state)
            wm = timerValues.getCurrentWatermarkInMs()
            self._handle.registerTimer(max(new_state[1] // 1000 + gap_ms, wm + 1))
            for o in out:
                yield self._emit(*o, uuid=key[0])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._open.exists():
                return
            start_us, last_us, n, clicks = self._open.get()
            # stale timer: the session was extended after this timer was
            # registered — a newer timer covers the new expiry
            if expiredTimerInfo.getExpiryTimeInMs() < last_us // 1000 + gap_ms:
                return
            self._open.clear()
            yield self._emit(start_us, last_us, n, clicks, uuid=key[0])

        def close(self) -> None:
            pass

    return SessionProcessor()


def stateful_sessions_v2(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionize a watermarked clickstream with the state-v2 keyed
    processor; returns the closed-session stream (append mode)."""
    n, unit = gap.split()
    per = {"second": 1000, "minute": 60_000, "hour": 3_600_000}[unit.rstrip("s")]
    gap_ms = int(n) * per
    return (
        stream.select("user_id", "event_id", "event_time", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_session_processor(gap_ms),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def stateful_session_v2_job(stream: DataFrame, out_path: str, checkpoint: str):
    """Run the state-v2 sessionizer over a (replay) stream into parquet.
    Pins the RocksDB state store provider — transformWithState requires
    it (and it is the provider large keyed state needs regardless)."""
    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        stateful_sessions_v2(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
