"""Unit tests for the exact-semantics function layer (F1-F18)."""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions import (
    decode_traffic_source,
    event_time_from_offset,
    geo_part,
    redis_feature_key,
)
from kafka_flink_streaming_pipeline_spark.session import EPOCH_ANCHOR_MS


def test_event_time_anchor_matches_reference_formula(spark):
    """F1: event_time = TO_TIMESTAMP_LTZ(timestamp + 1465876799998, 3)
    (events_postgres_sink.sql:21) — checked against DuckDB arithmetic
    over the same ms offsets."""
    offsets = [0, 1, 1000, 86_400_000, 1_296_000_001]  # up to +15 days
    df = spark.createDataFrame([(o,) for o in offsets], "timestamp: long")
    got = {
        r[0]: r[1]
        for r in df.select(
            "timestamp", event_time_from_offset(F.col("timestamp")).alias("et")
        ).collect()
    }
    con = duckdb.connect()
    for o in offsets:
        expected = con.execute(
            f"SELECT make_timestamp(({o} + {EPOCH_ANCHOR_MS}) * 1000)"
        ).fetchone()[0]
        assert got[o] == expected, o
    # anchor sanity: offset 0 lands on the dataset epoch 2016-06-14
    assert got[0].date() == datetime.date(2016, 6, 14)


def test_geo_part_missing_segments(spark):
    """F8: split_part returns '' for missing parts (Postgres parity) —
    the 1/2-part geo edge cases from FIXTURES.md."""
    df = spark.createDataFrame([("US>VA>511",), ("US>CA",), ("US",)], "geo: string")
    rows = df.select(
        geo_part(F.col("geo"), 1).alias("c"),
        geo_part(F.col("geo"), 2).alias("s"),
        geo_part(F.col("geo"), 3).alias("d"),
    ).collect()
    assert [tuple(r) for r in rows] == [
        ("US", "VA", "511"),
        ("US", "CA", ""),
        ("US", "", ""),
    ]


def test_redis_key_format(spark):
    """F3/F4: feat:user:{uuid}:yyyyMMddHHmm (redis_sink copy.sql:172-174)."""
    df = spark.createDataFrame(
        [("83e9ec48908c6a", datetime.datetime(2016, 6, 14, 21, 35, 0))],
        "uuid: string, win_end: timestamp",
    )
    row = df.select(
        redis_feature_key(F.col("uuid"), F.col("win_end")).alias("k")
    ).collect()[0]
    assert row.k == "feat:user:{83e9ec48908c6a}:201606142135"


def test_traffic_source_decode(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (0,), (4,), (None,)], "s: int")
    got = [r[0] for r in df.select(decode_traffic_source(F.col("s"))).collect()]
    assert got == ["Desktop", "Mobile", "Tablet", "Other", "Other", "Other"]


def test_temperature_sampling_flattens_head(spark):
    """The point of T=0.5 alpha-sampling: a low-resource source's SHARE
    of the sample must exceed its share of the raw corpus, and the
    head's share must shrink. Skewed synthetic corpus (the driver
    testdata's sources are uniform, so the registered oracle can't
    show this property)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.corpus import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(9000)] + [
        (10_000 + i, "small") for i in range(90)
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    got = temperature_sample(d, 500).groupBy("source").count().collect()
    shares = {r["source"]: r["count"] for r in got}
    n_sample = sum(shares.values())
    assert n_sample > 100  # enough draws to compare shares
    raw_small = 90 / 9090
    sampled_small = shares.get("small", 0) / n_sample
    # sqrt flattening: expected small share = sqrt(90)/(sqrt(9000)+sqrt(90))
    # ~ 0.091 vs raw ~ 0.0099 — a 9x boost; assert well past raw share
    assert sampled_small > 3 * raw_small, (sampled_small, raw_small)
    assert shares["big"] / n_sample < 1 - 3 * raw_small


def test_watermark_lateness_on_disorder(spark):
    """The watermark-lateness report on an ACTUALLY disordered stream
    (the driver testdata is in arrival order, so its registered oracle
    proves exactness but never exercises a drop): deterministic
    shuffled timestamps, drop counts checked against a pure-Python
    replay of the watermark semantics. Chunk width is 10k, and the
    stream spans several chunks, so the cross-chunk prefix-max path is
    exercised too."""
    import datetime
    import hashlib

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.plans.profiling import (
        _WM_THRESH_MS,
        watermark_lateness_report,
    )

    base = datetime.datetime(2024, 1, 1)
    n = 25_000  # 3 chunks of 10k
    # deterministic pseudo-shuffle: event i carries second-offset
    # i + jitter(i), jitter in [0, 20) — >5 s disorder exists, 30 s
    # bounds it
    def jitter(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 20

    rows = [
        (i, base + datetime.timedelta(seconds=i + jitter(i))) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r.watermark_ms: (r.n_events, r.n_dropped)
        for r in watermark_lateness_report(df).collect()
    }

    # pure-python watermark replay
    expected = {}
    for wm in _WM_THRESH_MS:
        runmax = None
        dropped = 0
        for i, ts in rows:
            if runmax is not None and (runmax - ts).total_seconds() * 1000 > wm:
                dropped += 1
            runmax = ts if runmax is None else max(runmax, ts)
        expected[wm] = (n, dropped)

    assert got == expected
    assert got[0][1] > 0  # the synthetic stream is actually disordered
    assert got[30000][1] == 0  # and bounded by the jitter range
