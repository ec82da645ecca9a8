from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")  # tiny data → few partitions
# tests exercise the BUILD paths (invariance tests would be vacuous if
# served from disk) and tmp-dir fixtures must not pollute the repo
# cache; tests/test_shared_cache.py opts back in with its own root
os.environ.setdefault("SPARK_GRAFT_SHARED_CACHE", "0")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

from kafka_flink_streaming_pipeline_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="session")
def spark():
    from kafka_flink_streaming_pipeline_spark import get_spark

    s = get_spark("kfsp-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver: testdata tables pre-registered as views."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con
