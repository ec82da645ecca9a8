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
    assert (cache.artifact_dir("t1", sf_copy, build) / "_SUCCESS").exists()


def test_mtime_invalidation(spark, cache, sf_copy):
    def build():
        return spark.range(3).withColumnRenamed("id", "x")

    cache.get_or_build_df(spark, sf_copy, "t2", build).collect()
    d1 = cache.artifact_dir("t2", sf_copy, build)
    # regenerate the source table → new mtime → new fingerprint
    time.sleep(0.01)
    Path(sf_copy, "documents.parquet").touch()
    d2 = cache.artifact_dir("t2", sf_copy, build)
    assert d1 != d2 and d1.exists() and not d2.exists()


def test_empty_result_not_cached(spark, cache, sf_copy):
    def build():
        return spark.range(5).filter("id < 0")

    out = cache.get_or_build_df(spark, sf_copy, "t3", build)
    assert out.count() == 0
    assert not cache.artifact_dir("t3", sf_copy, build).exists()


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


# --- r9: cache-poisoning coverage (VERDICT ask #3, ADVICE medium) ----------


def test_builder_source_change_invalidates(spark, cache, sf_copy):
    """Same key + same data, DIFFERENT builder logic → different
    artifact (the r8 design served the stale one until CACHE_VERSION
    was hand-bumped)."""

    def build_a():
        return spark.range(3).withColumnRenamed("id", "x")

    def build_b():
        return spark.range(3).selectExpr("id * 10 AS x")

    a = cache.get_or_build_df(spark, sf_copy, "same_key", build_a)
    b = cache.get_or_build_df(spark, sf_copy, "same_key", build_b)
    assert {r["x"] for r in a.collect()} == {0, 1, 2}
    assert {r["x"] for r in b.collect()} == {0, 10, 20}
    assert cache.artifact_dir("same_key", sf_copy, build_a) != cache.artifact_dir(
        "same_key", sf_copy, build_b
    )


def _helper_v1():
    return 1


def _helper_v2():
    return 2


def test_referenced_helper_change_invalidates(cache, sf_copy, monkeypatch):
    """The fingerprint folds in package-local functions the builder
    directly references (one level): a thin `lambda p: real_builder(p)`
    wrapper — the `ann_ivf_index` shape — must invalidate when the real
    builder's source changes. Helpers here live in the tests package,
    so widen the prefix for the probe."""
    monkeypatch.setattr(cache, "_PKG_PREFIX", "")

    def build():
        return helper()  # noqa: F821 — resolved via __globals__

    g1 = dict(build.__globals__, helper=_helper_v1)
    g2 = dict(build.__globals__, helper=_helper_v2)
    import types

    b1 = types.FunctionType(build.__code__, g1, "build")
    b2 = types.FunctionType(build.__code__, g2, "build")
    fp1 = cache.sf_fingerprint(sf_copy, b1)
    fp2 = cache.sf_fingerprint(sf_copy, b2)
    assert fp1 != fp2  # identical build source, different helper source
    # source-less callables must not crash the fingerprint
    exec_ns: dict = {}
    exec("def srcless():\n    return 3\n", exec_ns)
    assert len(cache.sf_fingerprint(sf_copy, exec_ns["srcless"])) == 16


def test_torn_publish_rebuilds(spark, cache, sf_copy):
    """A final dir missing _SUCCESS (torn publish / partial restore)
    must be discarded and rebuilt, not served."""
    builds = []

    def build():
        builds.append(1)
        return spark.range(4).withColumnRenamed("id", "x")

    cache.get_or_build_df(spark, sf_copy, "torn", build).collect()
    final = cache.artifact_dir("torn", sf_copy, build)
    (final / "_SUCCESS").unlink()  # simulate the torn write
    out = cache.get_or_build_df(spark, sf_copy, "torn", build)
    assert out.count() == 4
    assert len(builds) == 2  # rebuilt, not served torn
    assert (final / "_SUCCESS").exists()


def test_torn_path_artifact_rebuilds(spark, cache, sf_copy):
    def build_into(p: str) -> None:
        spark.range(4).write.mode("overwrite").parquet(p)

    p1 = Path(cache.get_or_build_path("tornidx", sf_copy, build_into))
    (p1 / cache._OK_MARKER).unlink()
    p2 = Path(cache.get_or_build_path("tornidx", sf_copy, build_into))
    assert p2 == p1 and (p2 / cache._OK_MARKER).exists()
    assert spark.read.parquet(str(p2)).count() == 4


def test_crashed_build_leaves_no_tmp_and_dead_tmp_swept(spark, cache, sf_copy):
    """build_into raising must not leak the pid tmp dir (try/finally);
    a tmp dir from a DEAD pid is swept by the next build."""

    def boom(p: str) -> None:
        Path(p).mkdir(parents=True)
        raise RuntimeError("mid-build crash")

    with pytest.raises(RuntimeError):
        cache.get_or_build_path("crash", sf_copy, boom)

    def build_into(p: str) -> None:
        spark.range(2).write.mode("overwrite").parquet(p)

    final = cache.artifact_dir("crash2", sf_copy, build_into)
    dead = final.with_name(final.name + ".tmp.999999999")
    dead.mkdir(parents=True)
    cache.get_or_build_path("crash2", sf_copy, build_into)
    assert not dead.exists()
    assert not list(cache._ROOT.glob("*.tmp.*"))


def test_enabled_cache_parity_real_operator(spark, cache, monkeypatch):
    """ADVICE r8 (medium): the suite disables the cache, so CI never
    exercised the disk-served path against a real operator. Run an
    LSH-graph consumer three ways — cache OFF, cache cold (builds +
    publishes), cache warm (served from disk) — and demand identical
    rows."""
    from kafka_flink_streaming_pipeline_spark.operators import dedup
    from kafka_flink_streaming_pipeline_spark.plans import merged

    spec = merged()["dedup_minhash_lsh"]

    def rows():
        return sorted(tuple(r) for r in spec.build(spark, SF_SMOKE).collect())

    monkeypatch.setenv("SPARK_GRAFT_SHARED_CACHE", "0")
    dedup._SHARED_SUBTREES.clear()
    baseline = rows()
    monkeypatch.setenv("SPARK_GRAFT_SHARED_CACHE", "1")
    dedup._SHARED_SUBTREES.clear()
    cold = rows()  # builds, publishes into the tmp root
    dedup._SHARED_SUBTREES.clear()
    warm = rows()  # must be served from disk
    dedup._SHARED_SUBTREES.clear()
    assert baseline == cold == warm
    assert list(cache._ROOT.glob("*__*"))  # something was actually cached
