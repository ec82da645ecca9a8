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


def test_hll_sketch_rollup_accuracy_and_mergeability(spark):
    """HLL sketch rollup: every per-type estimate and the union-merged
    ALL row must land within 5% of the exact distinct count (lgK=12 →
    ~1.6% standard error), and merging per-group sketches must equal
    sketching the union directly — the property that makes sketch
    rollup tables answer arbitrary group unions without fact re-scans."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.sketches import sketch_rollup
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    rows = sketch_rollup(spark, SF_CORRECT).collect()
    got = {r.event_type: r for r in rows}

    ev = load_table(spark, SF_CORRECT, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()

    assert set(got) == set(exact)
    for k, r in got.items():
        assert r.exact_users == exact[k], (k, r.exact_users, exact[k])
        assert r.within_5pct, k  # the hashable accuracy claim itself

    # merge-of-sketches == sketch-of-union, proven on the raw sketches
    merged_all = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long"))
        .collect()[0][0]
    )
    direct_all = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long"))
        .collect()[0][0]
    )
    assert merged_all == direct_all


def test_bottomk_sketch_merge_equals_direct(spark):
    """The bottom-k (KMV) sample must be MERGE-CLOSED: splitting the
    input into shards, taking each shard's bottom-k, unioning the
    per-shard samples and re-taking bottom-k must equal the bottom-k
    of the whole input — the property that lets per-partition /
    per-day sketch rollups answer any union without re-scanning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.sketches import _BK
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    orders = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderpriority",
        F.md5(F.col("o_orderkey").cast("string")).alias("rk"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("rk", "o_orderkey")

    def bottomk(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _BK)
            .drop("rn")
        )

    direct = {tuple(r) for r in bottomk(orders).collect()}
    shards = [
        bottomk(orders.filter(F.col("o_orderkey") % 3 == i)) for i in range(3)
    ]
    union = (
        shards[0]
        .unionByName(shards[1])
        .unionByName(shards[2])
        .unionByName(shards[0])  # shard 0 redelivered
    )
    # dropDuplicates BEFORE re-ranking: a redelivered copy must not
    # occupy a rank slot (sketch rows are keyed, so dedup is exact)
    merged = {tuple(r) for r in bottomk(union.dropDuplicates()).collect()}
    assert merged == direct


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Incremental view maintenance: updating the rollup one date-slice
    at a time (with an overlapping redelivery) must converge to exactly
    the full recompute — dynamic partition overwrite keeps per-date
    updates idempotent and history untouched."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.jobs.incremental_rollup import (
        read_rollup,
        rollup_frame,
        update_rollup,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    dates = sorted(r[0] for r in ev.select(F.to_date("ts")).distinct().collect())
    assert len(dates) >= 4
    half = len(dates) // 2
    rollup = str(tmp_path / "rollup")

    update_rollup(spark, ev, rollup, dates[:half])
    n_after_first = read_rollup(spark, rollup).count()
    assert 0 < n_after_first
    update_rollup(spark, ev, rollup, dates[half:])
    # redeliver an already-processed slice (retry) — must be a no-op
    update_rollup(spark, ev, rollup, dates[half - 1 : half + 1])

    got = {
        (str(r.d), r.event_type, r.n, r.value_cents, r.users)
        for r in read_rollup(spark, rollup).collect()
    }
    want = {
        (str(r.d), r.event_type, r.n, r.value_cents, r.users)
        for r in rollup_frame(ev).collect()
    }
    assert got == want


def test_cms_merge_is_exact_and_estimates_bound(spark):
    """Count-min sketch properties (Cormode & Muthukrishnan 2005):
    (1) mergeability is EXACT — element-wise counter addition of two
    shard sketches equals the sketch of the union (counters are sums;
    this is what lets 1000 executors sketch independently and a rollup
    table merge shards without fact re-scans); (2) point queries never
    underestimate; (3) the sketch stays d×w rows regardless of input
    cardinality."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.sketches import (
        _CMS_D,
        _CMS_W,
        cms_build,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    whole = cms_build(ev, "user_id")
    assert whole.count() <= _CMS_D * _CMS_W

    # (1) shard-and-merge == sketch of union, exactly
    s1 = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    s2 = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        s1.select("row_i", "bucket", "cnt")
        .unionByName(s2.select("row_i", "bucket", "cnt"))
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0

    # (2) est >= exact for every key (the CMS one-sided error guarantee)
    from kafka_flink_streaming_pipeline_spark.operators.sketches import (
        sketch_cms_heavy_hitters,
    )

    top = sketch_cms_heavy_hitters(spark, SF_CORRECT)
    rows = top.collect()
    assert len(rows) == 20
    assert all(r.overestimate >= 0 for r in rows)
