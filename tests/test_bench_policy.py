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


def test_dirty_start_warning_fires_only_on_contaminated_start():
    # the r10 sf1 case: 6.52 s start vs 0.365 settled -> warn
    w = bench._dirty_start_warning(6.52, 0.365)
    assert w is not None and "dirty battery start" in w
    # clean boots (r10 sf0.1: 0.619 -> 0.387) stay silent
    assert bench._dirty_start_warning(0.619, 0.387) is None
    # exactly at the factor is NOT dirty (strict >), and a zero end
    # canary must not divide/flag
    assert bench._dirty_start_warning(1.2, 0.4) is None
    assert bench._dirty_start_warning(0.5, 0.0) is None


def test_canary_stable_band():
    # r12 verdict ask #4: the headline verdict uses the same 1.3x band
    # bench_diff refuses to normalize across. Stable pairs (r13's
    # 0.382/0.314 = 1.22x) pass; the r12 sf1 transition pairs fail.
    assert bench._canary_stable(0.382, 0.314) is True
    assert bench._canary_stable(0.4, 0.4) is True
    assert bench._canary_stable(0.458, 0.265) is False  # 1.73x
    assert bench._canary_stable(6.52, 0.365) is False  # r10 dirty start
    # missing/zero canaries are NOT stable (no evidence either way)
    assert bench._canary_stable(0.0, 0.4) is False
    assert bench._canary_stable(0.4, 0.0) is False


def test_bench_headline_line_carries_canary_stable(tmp_path):
    """Run bench.py as the driver does (subprocess, sf0.001) with every
    entry skipped: the battery degenerates to warmup + canaries, and
    BOTH emitted JSON documents must carry the canary_stable verdict."""
    import os
    import subprocess

    from kafka_flink_streaming_pipeline_spark.plans import merged

    skip = sorted(
        set(merged())
        | {
            "shared_exact_graph_build",
            "shared_lsh_graph_build",
            "shared_ann_index_build",
            "shared_pq_codes_build",
            "shared_kmeans_cells_build",
            "shared_exact_topk_build",
            "shared_power_iteration",
        }
    )
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_SKIP=",".join(skip),
        SPARK_GRAFT_SHUFFLE="8",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    docs = [json.loads(l) for l in lines]
    headline = docs[-1]
    assert headline["metric"] == "headline_queries_wall_clock"
    assert isinstance(headline.get("canary_stable"), bool)
    detail = [d for d in docs if "canary_s" in d]
    assert detail and all(
        isinstance(d.get("canary_stable"), bool) for d in detail
    )


def test_bench_diff_min_abs_is_canary_normalized(tmp_path):
    # A raw +0.25 s "regression" that is fully explained by a 2x slower
    # boot (canary 0.4 -> 0.8) must NOT pass the min_abs gate once the
    # delta is normalized: 0.75/2 - 0.5 = -0.125 s (ADVICE r10 #3 —
    # previously the ratio gate normalized but the abs-delta gate
    # compared raw seconds, so the two gates could disagree).
    import subprocess

    old = {"value": 0.5, "queries": {"q": 0.5}, "canary_s": {"start": 0.4, "end": 0.5}}
    new = {"value": 0.75, "queries": {"q": 0.75}, "canary_s": {"start": 0.8, "end": 0.9}}
    (tmp_path / "old.json").write_text(json.dumps(old))
    (tmp_path / "new.json").write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"),
         str(tmp_path / "old.json"), str(tmp_path / "new.json"),
         "--ratio", "1.2", "--min-abs", "0.2"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "no per-query regressions" in out
    # and a REAL regression that survives normalization still fires:
    # 2.0 -> 6.0 with the same 2x boot factor is 3.0 normalized seconds
    # vs 2.0 -> delta 1.0 >= 0.2 and ratio 1.5x > 1.2
    old["queries"]["q"] = 2.0
    new["queries"]["q"] = 6.0
    (tmp_path / "old.json").write_text(json.dumps(old))
    (tmp_path / "new.json").write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"),
         str(tmp_path / "old.json"), str(tmp_path / "new.json"),
         "--ratio", "1.2", "--min-abs", "0.2"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "regressed" in out and "q: 2.0 -> 6.0" in out


def test_bench_diff_warns_on_unstable_canary_pair(tmp_path):
    # r12: both sf1 batteries produced phantom normalized regressions
    # because their OWN start/end canaries disagreed (box settling
    # mid-run) — one factor cannot normalize a battery that spanned a
    # machine-context transition. bench_diff must warn and point at
    # the raw column; a stable pair must stay silent.
    import subprocess

    def run(old, new):
        (tmp_path / "old.json").write_text(json.dumps(old))
        (tmp_path / "new.json").write_text(json.dumps(new))
        return subprocess.run(
            [sys.executable, str(REPO / "tools" / "bench_diff.py"),
             str(tmp_path / "old.json"), str(tmp_path / "new.json")],
            capture_output=True, text=True, check=True,
        ).stdout

    stable = {"value": 1.0, "queries": {"q": 1.0},
              "canary_s": {"start": 0.40, "end": 0.44}}
    unstable = {"value": 1.0, "queries": {"q": 1.0},
                "canary_s": {"start": 0.499, "end": 0.267}}
    out = run(stable, unstable)
    assert "WARNING: NEW battery's own canary pair is unstable" in out
    assert "read the RAW ratio column" in out
    out = run(unstable, stable)
    assert "WARNING: OLD battery's own canary pair is unstable" in out
    out = run(stable, stable)
    assert "unstable" not in out
