"""Materialize the pipeline-ops health report — the profiling operators
composed the way an on-call runbook consumes them, one artifact per
question an operator actually asks:

    events ─┬─► DQ expectation gate (PK/FK/null)   → dq_gate.parquet
            ├─► watermark-lateness cost curve      → watermark_cost.parquet
            ├─► hot-key skew diagnostic            → key_skew.parquet
            ├─► median/MAD volume anomalies        → anomalous_hours.parquet
            ├─► day-over-day category-mix drift    → category_drift.parquet
            └─► session-gap sizing quantiles       → session_gaps.parquet
  documents ─► per-source composition report       → source_mix.parquet

Every one of these is a registered, driver-oracle-checked query
(`plans/profiling.py`) — this example only composes and writes them,
plus prints the one-line verdicts a health check surfaces first:
did the DQ gate pass, which day drifted hardest, which key is hottest.

Run:  python examples/ops_health_report.py \
          [--sf-dir /root/testdata/sf0.01] [--out /tmp/kfsp_ops]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/kfsp_ops")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.plans.profiling import (
        _anomalous_hours,
        _category_drift,
        _dq_expectations,
        _key_skew_profile,
        _session_gap_profile,
        _source_mix,
        _watermark_lateness,
    )

    spark = get_spark("kfsp-ops-health")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)

    dq = _dq_expectations(spark, args.sf_dir)
    dq.write.mode("overwrite").parquet(str(out / "dq_gate.parquet"))
    failures = [r for r in dq.collect() if not r.passed]
    print(f"DQ gate: {'PASS' if not failures else 'FAIL'}"
          + (f" — {[(r.expectation, r.n_violations) for r in failures]}"
             if failures else ""))

    wm = _watermark_lateness(spark, args.sf_dir)
    wm.write.mode("overwrite").parquet(str(out / "watermark_cost.parquet"))
    print("watermark cost curve:",
          {r[wm.columns[0]]: r[wm.columns[-1]] for r in wm.collect()[:5]}, "…")

    skew = _key_skew_profile(spark, args.sf_dir)
    skew.write.mode("overwrite").parquet(str(out / "key_skew.parquet"))
    hot = skew.orderBy(F.desc(skew.columns[-1])).first()
    print(f"hottest key row: {hot.asDict()}")

    anom = _anomalous_hours(spark, args.sf_dir)
    anom.write.mode("overwrite").parquet(str(out / "anomalous_hours.parquet"))
    print(f"anomalous hours flagged: {anom.count()}")

    drift = _category_drift(spark, args.sf_dir)
    drift.write.mode("overwrite").parquet(str(out / "category_drift.parquet"))
    worst = drift.orderBy(F.desc("l1_ppm")).first()
    print(f"max category drift: {worst.day} l1_ppm={worst.l1_ppm} "
          f"top_mover={worst.top_type} ({worst.top_delta_ppm:+d} ppm)")

    gaps = _session_gap_profile(spark, args.sf_dir)
    gaps.write.mode("overwrite").parquet(str(out / "session_gaps.parquet"))
    print(f"session-gap sizing rows: {gaps.count()}")

    mix = _source_mix(spark, args.sf_dir)
    mix.write.mode("overwrite").parquet(str(out / "source_mix.parquet"))
    dup_worst = mix.orderBy(F.desc("dup_ppm")).first()
    print(f"most-duplicated source: {dup_worst.source} "
          f"dup_ppm={dup_worst.dup_ppm}")
    print("done")


if __name__ == "__main__":
    main()
