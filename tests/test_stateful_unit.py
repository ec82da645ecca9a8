"""Property-based unit tests for the applyInPandasWithState sessionizer
closure (streaming/stateful.py) — the chunk-boundary merge logic is the
part a single replay fixture can't exhaustively cover, so hypothesis
drives random event streams through random micro-batch splits and
checks the emitted sessions against a straight-line reference
sessionizer."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_flink_streaming_pipeline_spark.streaming.stateful import _make_sessionizer

GAP_MS = 30 * 60 * 1000
GAP_US = GAP_MS * 1000


class FakeState:
    """Just enough GroupState surface for the closure."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def reference_sessions(ts_us: list[int], clicks: list[bool]):
    """Straight-line 30-min-idle sessionizer over a sorted stream."""
    out, cur = [], None
    for t, c in zip(ts_us, clicks):
        if cur is None:
            cur = [t, t, 0, 0]
        elif t - cur[1] > GAP_US:
            out.append(tuple(cur))
            cur = [t, t, 0, 0]
        cur[1] = t
        cur[2] += 1
        cur[3] += int(c)
    if cur is not None:
        out.append(tuple(cur))
    return out


def run_operator(ts_us: list[int], clicks: list[bool], splits: list[int]):
    """Feed the stream through the closure in micro-batch chunks, then
    fire the final event-time timeout."""
    fn = _make_sessionizer(GAP_MS)
    state = FakeState()
    emitted = []

    def feed(lo, hi):
        pdf = pd.DataFrame(
            {
                "user_id": 1,
                "event_id": list(range(lo, hi)),
                "event_time": pd.to_datetime(ts_us[lo:hi], unit="us"),
                "event_type": ["click" if c else "view" for c in clicks[lo:hi]],
            }
        )
        for out in fn((1,), iter([pdf]), state):
            emitted.append(out)

    bounds = [0] + sorted(splits) + [len(ts_us)]
    for lo, hi in zip(bounds, bounds[1:]):
        if hi > lo:
            feed(lo, hi)
    if state.exists:
        state.hasTimedOut = True
        for out in fn((1,), iter([]), state):
            emitted.append(out)
    if not emitted:
        return []
    allout = pd.concat(emitted, ignore_index=True)
    return [
        (
            int(r.session_start.value // 1000),
            int(r.session_end.value // 1000),
            int(r.n_events),
            int(r.n_clicks),
        )
        for r in allout.itertuples()
    ]


@settings(max_examples=200, deadline=None)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=3 * GAP_US), min_size=1, max_size=40
    ),
    clicks=st.data(),
    splits=st.data(),
)
def test_sessionizer_matches_reference_under_any_chunking(gaps, clicks, splits):
    base = 1_700_000_000_000_000  # µs epoch, arbitrary
    ts = []
    t = base
    for g in gaps:
        t += g
        ts.append(t)
    cl = clicks.draw(
        st.lists(st.booleans(), min_size=len(ts), max_size=len(ts)), label="clicks"
    )
    sp = splits.draw(
        st.lists(
            st.integers(min_value=0, max_value=len(ts)), max_size=6
        ),
        label="splits",
    )
    assert run_operator(ts, cl, sp) == reference_sessions(ts, cl)


def test_sessionizer_boundary_exact_gap_is_same_session():
    """gap == 30 min exactly must NOT split (strict > rule, matching
    the reference's `> interval '30 minutes'`)."""
    base = 1_700_000_000_000_000
    ts = [base, base + GAP_US, base + 2 * GAP_US + 1]
    got = run_operator(ts, [True, False, True], [])
    assert got == [
        (base, base + GAP_US, 2, 1),
        (base + 2 * GAP_US + 1, base + 2 * GAP_US + 1, 1, 1),
    ]
