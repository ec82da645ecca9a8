"""Invariants for the power-iteration embedding diagnostics and the
shuffle manifest (round 7). Oracle parity runs in test_oracle_parity;
these pin the MATH and the addressing contracts independently.

Honesty split (the ivf_kmeans precedent): the driver embeddings are
ISOTROPIC, so their spectrum is a tight Marchenko-Pastur bulk with a
near-1 eigenvalue ratio — K=6 power rounds cannot (and should not
claim to) isolate the top eigenvector there; what they produce is a
valid Rayleigh-quotient LOWER BOUND on the top share, and the tests
verify exactly that arithmetic against numpy. Where a dominant
direction actually EXISTS (a planted-spike fixture), the same 6 rounds
must recover it to |cos| ≥ 0.99 — the claim the operator ships for."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_CORRECT


def _emb_matrix() -> np.ndarray:
    t = pq.read_table(f"{SF_CORRECT}/embeddings.parquet")
    return np.array(t.column("embedding").to_pylist(), dtype=np.float64)


def _collect_v(spark, sf_dir) -> np.ndarray:
    from kafka_flink_streaming_pipeline_spark.operators.linalg import (
        embedding_top_pc,
    )

    v = np.zeros(64)
    for r in embedding_top_pc(spark, sf_dir).collect():
        v[r["dim"]] = r["v_micro"]
    return v


def test_top_pc_normalization_and_rayleigh_bound(spark):
    """Max-abs normalization pins one component to exactly ±1e6, and
    the direction's Rayleigh quotient must already dominate the
    spectrum MEAN (share > 1/64) — 6 rounds of a PSD operator can only
    move the quotient up from the flat start."""
    v = _collect_v(spark, SF_CORRECT)
    assert int(np.max(np.abs(v))) == 1_000_000

    x = np.floor(_emb_matrix() * 1e6 + 0.5)  # the operator's quantization
    m = x.T @ x
    rq_share = (v @ m @ v) / (v @ v) / np.trace(m)
    assert rq_share > 1 / 64
    evals = np.linalg.eigvalsh(m)
    assert rq_share <= evals[-1] / evals.sum() + 1e-12  # Rayleigh ≤ λ_top


def test_anisotropy_share_is_the_rayleigh_quotient(spark):
    """The reported ppm is EXACTLY the Rayleigh share of the emitted
    direction (numpy recomputation, integer-rounding tolerance), and is
    bounded by the true top-eigenvalue share — the estimate never
    overstates anisotropy."""
    from kafka_flink_streaming_pipeline_spark.operators.linalg import (
        embedding_anisotropy,
    )

    row = embedding_anisotropy(spark, SF_CORRECT).collect()[0]
    v = _collect_v(spark, SF_CORRECT)
    x = np.floor(_emb_matrix() * 1e6 + 0.5)
    s = x @ v
    expected = (s @ s) / ((v @ v) * (x * x).sum())
    assert row["top_share_ppm"] == int(np.floor(expected * 1e6 + 0.5))
    evals = np.linalg.eigvalsh(x.T @ x)
    assert row["top_share_ppm"] / 1e6 <= evals[-1] / evals.sum() + 1e-9
    assert row["n_vecs"] == x.shape[0]


@pytest.fixture(scope="module")
def spiked_emb_dir(spark, tmp_path_factory):
    """Planted-spike testbed: x = a·u + ε with a ~ N(0, 2) against
    unit-variance-ish noise — one dominant direction with a real
    eigengap, the regime the operator's convergence claim is FOR."""
    rng = np.random.default_rng(11)
    n, d = 400, 64
    u = rng.standard_normal(d)
    u /= np.linalg.norm(u)
    a = 2.0 * rng.standard_normal((n, 1))
    x = a * u + 0.2 * rng.standard_normal((n, d))
    rows = [(i, [float(c) for c in x[i]], 0) for i in range(n)]
    out = str(tmp_path_factory.mktemp("spiked"))
    (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out + "/embeddings.parquet")
    )
    return out, u


def test_top_pc_recovers_planted_spike(spark, spiked_emb_dir):
    """Where a dominant direction exists, 6 rounds must recover it:
    |cos(v, u)| ≥ 0.99 against the planted spike, and the anisotropy
    report must show a dominant share (≥ 0.5 of total energy)."""
    from kafka_flink_streaming_pipeline_spark.operators.linalg import (
        embedding_anisotropy,
    )

    out, u = spiked_emb_dir
    v = _collect_v(spark, out)
    cos = abs(v @ u) / (np.linalg.norm(v) * np.linalg.norm(u))
    assert cos >= 0.99, cos

    row = embedding_anisotropy(spark, out).collect()[0]
    assert row["top_share_ppm"] >= 500_000


def test_shuffle_manifest_is_bijective_and_deterministic(spark):
    """Every doc gets exactly one (shard, pos) address; positions are
    dense 1..n_shard within each shard; a second run reproduces the
    manifest exactly (pure function of doc identity)."""
    from kafka_flink_streaming_pipeline_spark.operators.corpus import (
        _SHUFFLE_SHARDS,
        corpus_shuffle_manifest,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = corpus_shuffle_manifest(spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs

    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < _SHUFFLE_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(by_shard) == _SHUFFLE_SHARDS  # 500 docs: no empty shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))

    again = {
        (r["shard"], r["pos"], r["doc_id"])
        for r in corpus_shuffle_manifest(spark, SF_CORRECT).collect()
    }
    assert again == {(r["shard"], r["pos"], r["doc_id"]) for r in rows}


@pytest.fixture(scope="module")
def planted_leak_dir(spark, tmp_path_factory):
    """Split-leakage testbed: isotropic vectors, except every test-split
    vector whose vec_id % 5 == 0 is an EXACT COPY of some train-split
    vector — planted semantic leaks the histogram must surface in the
    100-bucket."""
    import numpy as np

    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        _TRAIN_PCT,
        _VAL_PCT,
    )
    import hashlib

    def split_of(vid: int) -> str:
        b = int(hashlib.md5(str(vid).encode()).hexdigest()[:4], 16) % 100
        return (
            "train"
            if b < _TRAIN_PCT
            else ("val" if b < _TRAIN_PCT + _VAL_PCT else "test")
        )

    rng = np.random.default_rng(3)
    n, d = 500, 64
    x = rng.standard_normal((n, d))
    train_ids = [i for i in range(n) if split_of(i) == "train"]
    test_ids = [i for i in range(n) if split_of(i) == "test"]
    planted = [t for t in test_ids if t % 5 == 0]
    for j, t in enumerate(planted):
        x[t] = x[train_ids[j]]  # exact copy → cosine 1.0
    rows = [(i, [float(c) for c in x[i]], 0) for i in range(n)]
    out = str(tmp_path_factory.mktemp("leaky"))
    (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out + "/embeddings.parquet")
    )
    return out, len(test_ids), len(planted)


def test_semantic_leakage_finds_planted_leaks(spark, planted_leak_dir):
    """The histogram accounts for every test vector, and the planted
    exact copies all land in the 100-bucket (cosine 1.0 survives the
    IVF cell path: an identical vector shares its twin's cell by
    construction). Isotropic non-leaks stay far below."""
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        split_leakage_semantic,
    )

    out, n_test, n_planted = planted_leak_dir
    hist = {
        r["cos_bucket_pct"]: r["n_test"]
        for r in split_leakage_semantic(spark, out).collect()
    }
    assert sum(hist.values()) == n_test
    assert hist.get(100, 0) == n_planted
    # isotropic best-matches concentrate well under 0.9
    assert sum(v for k, v in hist.items() if 90 <= k < 100) == 0


def test_knn_label_agreement_diagonal_on_clustered(spark, tmp_path_factory):
    """On label-aligned clusters, 1-NN label agreement must be ~pure
    diagonal (each vector's nearest neighbor shares its cluster); the
    matrix must also account for every vector exactly once."""
    import numpy as np

    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        knn_label_agreement,
    )

    rng = np.random.default_rng(5)
    k, n, d, sigma = 8, 400, 64, 0.02
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = [
        (
            vid,
            [float(x) for x in (centers[vid % k] + sigma * rng.standard_normal(d))],
            vid % k,
        )
        for vid in range(n)
    ]
    out = str(tmp_path_factory.mktemp("knn_clustered"))
    (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out + "/embeddings.parquet")
    )
    mat = {
        (r["label"], r["nn_label"]): r["n"]
        for r in knn_label_agreement(spark, out).collect()
    }
    assert sum(mat.values()) == n  # every vector classified exactly once
    diag = sum(v for (a, b), v in mat.items() if a == b)
    assert diag >= int(n * 0.95), mat  # tight clusters → ~pure diagonal
    assert all(b != -1 for (_, b) in mat)  # full coverage, no empty cells
