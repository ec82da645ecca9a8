"""Keep the runnable examples from rotting: each is executed as a real
subprocess (its own SparkSession, own JVM — exactly how a user runs
it) at the smoke scale factor. The examples self-verify with asserts,
so exit code 0 IS the check.

Only examples that run in this container are covered (the Airflow DAG
needs Airflow; the Prometheus endpoint runs a server loop)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_kafka_pipeline_end_to_end_example(tmp_path):
    """The reference's full topology demo (produce → partitioned wire →
    consumer group → fanout raw + rollup, self-verifying exactly-once
    across a produce-while-down restart) must run green end-to-end."""
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "kafka_pipeline_end_to_end.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "e2e"),
        ],
        capture_output=True,
        text=True,
        timeout=570,
        cwd=str(REPO),
        env={**os.environ, "SPARK_GRAFT_SHARED_CACHE": "0"},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = proc.stdout
    assert "rows exactly once" in out and "equal to batch recompute" in out
