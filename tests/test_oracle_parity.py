"""Run every registered query against its DuckDB oracle — the same gate
the driver applies (row count + schema + order-insensitive values) at
sf0.01."""

from __future__ import annotations

import pytest

from kafka_flink_streaming_pipeline_spark.plans import merged

from tests.conftest import SF_CORRECT, make_duck
from tests.harness import compare

ALL = merged()
ORACLED = sorted(k for k, v in ALL.items() if v.oracle is not None)
ROWS_ONLY = sorted(k for k, v in ALL.items() if v.oracle is None)


@pytest.fixture(scope="module")
def duck_correct():
    con = make_duck(SF_CORRECT)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck_correct, name):
    spec = ALL[name]
    df = spec.build(spark, SF_CORRECT)
    compare(df, duck_correct, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = ALL[name]
    df = spec.build(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
