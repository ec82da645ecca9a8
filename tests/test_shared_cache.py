"""Disk-backed shared-artifact cache (operators/shared_cache.py):
round-trip equality, cross-"process" (cold-memo) serving, mtime
invalidation, and the empty-result guard. The rest of the suite runs
with SPARK_GRAFT_SHARED_CACHE=0 (conftest) so build paths stay
exercised; this module opts in against its own temp root."""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def cache(monkeypatch, tmp_path):
    from kafka_flink_streaming_pipeline_spark.operators import shared_cache

    monkeypatch.setenv("SPARK_GRAFT_SHARED_CACHE", "1")
    monkeypatch.setattr(shared_cache, "_ROOT", tmp_path / "shared_cache")
    return shared_cache


@pytest.fixture()
def sf_copy(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(Path(SF_SMOKE) / "documents.parquet", d / "documents.parquet")
    return str(d)


def test_df_round_trip_and_disk_serving(spark, cache, sf_copy):
    builds = []

    def build():
        builds.append(1)
        return (
            spark.read.parquet(f"{sf_copy}/documents.parquet")
            .groupBy("source")
            .agg(F.count("*").alias("n"))
        )

    first = {(r["source"], r["n"]) for r in
             cache.get_or_build_df(spark, sf_copy, "t1", build).collect()}
    # second call: same fingerprint → served from disk, build not re-run
    second = {(r["source"], r["n"]) for r in
              cache.get_or_build_df(spark, sf_copy, "t1", build).collect()}
    assert first == second and len(builds) == 1
    assert (cache.artifact_dir("t1", sf_copy) / "_SUCCESS").exists()


def test_mtime_invalidation(spark, cache, sf_copy):
    def build():
        return spark.range(3).withColumnRenamed("id", "x")

    cache.get_or_build_df(spark, sf_copy, "t2", build).collect()
    d1 = cache.artifact_dir("t2", sf_copy)
    # regenerate the source table → new mtime → new fingerprint
    time.sleep(0.01)
    Path(sf_copy, "documents.parquet").touch()
    d2 = cache.artifact_dir("t2", sf_copy)
    assert d1 != d2 and d1.exists() and not d2.exists()


def test_empty_result_not_cached(spark, cache, sf_copy):
    def build():
        return spark.range(5).filter("id < 0")

    out = cache.get_or_build_df(spark, sf_copy, "t3", build)
    assert out.count() == 0
    assert not cache.artifact_dir("t3", sf_copy).exists()


def test_json_artifact(cache, sf_copy):
    calls = []

    def build():
        calls.append(1)
        return [1, 2, 3]

    assert cache.get_or_build_json(sf_copy, "vec", build) == [1, 2, 3]
    assert cache.get_or_build_json(sf_copy, "vec", build) == [1, 2, 3]
    assert len(calls) == 1


def test_path_artifact_promotion(spark, cache, sf_copy):
    def build_into(p: str) -> None:
        spark.range(4).write.mode("overwrite").parquet(p)

    p1 = cache.get_or_build_path("idx", sf_copy, build_into)
    p2 = cache.get_or_build_path("idx", sf_copy, build_into)
    assert p1 == p2
    assert spark.read.parquet(p1).count() == 4
