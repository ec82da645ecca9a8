"""Bench-harness measurement-policy tests (no Spark needed).

The r9 verdict found the mover re-measure policy self-defeating: with
SPARK_GRAFT_BENCH_PREV unset it compared against the lexicographically
LAST BENCH_DETAIL_r*.json — during an rN session that is an rN-family
file (self-comparison, drift ~1x) or an other-sf variant (prev={}),
so the min-of-3 policy could never fire against the previous round.
These tests pin the fixed selection rule plus the pre-build skip
fail-fast and the exact-anchor auto-skip set.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench


def test_prev_snapshot_is_prior_round_same_sf(tmp_path, monkeypatch):
    # build a fake repo root with mixed snapshots and point bench at it
    def snap(name: str, sf: float) -> None:
        (tmp_path / name).write_text(json.dumps({"sf": sf, "queries": {}}))

    snap("BENCH_DETAIL_r8.json", 0.1)
    snap("BENCH_DETAIL_r9.json", 0.1)
    snap("BENCH_DETAIL_r9_sf10.json", 10.0)
    snap("BENCH_DETAIL_r9_honest.json", 0.1)
    snap("BENCH_DETAIL_r9_cold.json", 0.1)
    snap("BENCH_DETAIL_r10.json", 0.1)  # same-round: must never be picked
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    # current round = 10 (newest CORRECTNESS is r09): r10 excluded,
    # plain r9 outranks its _honest variant, _cold excluded, sf matched
    assert bench._current_round() == 10
    assert Path(bench._prev_snapshot(0.1)).name == "BENCH_DETAIL_r9.json"
    assert Path(bench._prev_snapshot(10.0)).name == "BENCH_DETAIL_r9_sf10.json"
    assert bench._prev_snapshot(1.0) == ""  # no sf1 snapshot at all


def test_prev_snapshot_never_self_round(tmp_path, monkeypatch):
    (tmp_path / "BENCH_DETAIL_r10.json").write_text(
        json.dumps({"sf": 0.1, "queries": {}})
    )
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_snapshot(0.1) == ""


def test_round_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert bench._current_round() == 7


def test_prebuild_skip_fail_fast():
    # skipping a pre-build without its consumers must refuse to run;
    # RuntimeError (not assert) so the check survives python -O
    with pytest.raises(RuntimeError, match="dedup_components"):
        bench._check_prebuild_skips({"shared_exact_graph_build"})
    with pytest.raises(RuntimeError, match="dedup_minhash_lsh"):
        bench._check_prebuild_skips({"shared_lsh_graph_build"})
    with pytest.raises(RuntimeError, match="sim_ann_recall_report"):
        bench._check_prebuild_skips(
            {"shared_pq_codes_build", "embedding_pq_codes", "sim_topk_cosine_pq",
             "sim_ann_ivfpq", "hybrid_retrieval_mmr_ann", "hybrid_retrieval_rrf_ann"}
        )
    # the full consumer set makes it legal
    ok = {"shared_exact_graph_build", *bench.PREBUILD_CONSUMERS["shared_exact_graph_build"]}
    bench._check_prebuild_skips(ok)
    bench._check_prebuild_skips(set())


def test_exact_anchor_set_closed_under_prebuild_consumers():
    # the sf>=1 auto-skip must itself satisfy the fail-fast invariant
    bench._check_prebuild_skips(set(bench.EXACT_ANCHORS))


def test_prebuild_consumers_are_registry_entries():
    from kafka_flink_streaming_pipeline_spark.plans import merged

    plans = merged()
    for build, consumers in bench.PREBUILD_CONSUMERS.items():
        for c in consumers:
            assert c in plans, f"{build} consumer {c} not in registry"
    for n in bench.EXACT_ANCHORS:
        if not n.startswith("shared_"):
            assert n in plans
