"""Property-based tests for the keyed MERGE upsert (streaming/upsert.py)
— the engine's substitute for Flink's PK-inferred upsert sink. The model
is a dict: after any sequence of batches (each possibly redelivered, as
checkpoint replay does), the table holds exactly the latest row per key.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_flink_streaming_pipeline_spark.streaming.upsert import merge_upsert

# each batch: list of (key, value); seq is assigned globally in order
BATCHES = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.integers(0, 100)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES, redeliver=st.booleans())
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, batches, redeliver):
    table = str(tmp_path_factory.mktemp("upsert") / "t")
    model: dict[int, tuple[int, int]] = {}
    seq = 0
    for batch in batches:
        rows = []
        for k, v in batch:
            rows.append((k, v, seq))
            model[k] = (v, seq)
            seq += 1
        df = spark.createDataFrame(rows, "key int, value int, seq long")
        merge_upsert(spark, df, table, ["key"], "seq")
        if redeliver:  # checkpoint replay: the same batch arrives again
            merge_upsert(spark, df, table, ["key"], "seq")
    got = {r.key: (r.value, r.seq) for r in spark.read.parquet(table).collect()}
    assert got == model


def test_merge_upsert_late_batch_loses_on_order_col(spark, tmp_path_factory):
    """Within one batch the HIGHEST order_col wins the key (dedupe
    before merge) — the contract FP2 relies on when a trigger carries
    several refinements of the same window."""
    table = str(tmp_path_factory.mktemp("upsert") / "t")
    df = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 30, 7)], "key int, value int, seq long"
    )
    merge_upsert(spark, df, table, ["key"], "seq")
    got = {r.key: r.value for r in spark.read.parquet(table).collect()}
    assert got == {1: 20, 2: 30}
