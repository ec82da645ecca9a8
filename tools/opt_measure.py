"""Per-entry optimization harness (r13): capture .explain("formatted")
and bench-methodology timings for named registry entries, without
running the whole battery.

Usage:
    python tools/opt_measure.py [--plans-dir DIR] [--suffix before|after]
                                [--runs N] [--no-time] name [name ...]

For each entry: writes DIR/<name>_<suffix>.txt with the formatted plan
(same plan the driver's bench executes) and prints a JSON line with the
min-of-N timing measured exactly like bench.py (warm run first, then N
cache-cleared xxhash64-materialized runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.plans import merged

    spark = get_spark("kfsp-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    plans = merged()

    out_dir = Path(__file__).resolve().parent.parent / args.plans_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    def _materialize(df) -> int:
        try:
            probe = df.select(
                F.count("*").alias("n"),
                F.expr(
                    "bit_xor(xxhash64("
                    + ", ".join(f"`{c}`" for c in df.columns)
                    + "))"
                ).alias("h"),
            )
            probe.schema
            return probe.collect()[0]["n"]
        except Exception:
            return df.count()

    # absorb JVM cold start the way bench.py does
    spark.range(1000).selectExpr("sum(id)").collect()

    results = {}
    for name in args.names:
        if name not in plans:
            print(f"UNKNOWN ENTRY: {name}", file=sys.stderr)
            return 2
        df = plans[name].build(spark, sf_dir)
        if not args.no_plan:
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{args.suffix}.txt").write_text(plan_txt)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        warm_n = _materialize(plans[name].build(spark, sf_dir))
        best = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            n = _materialize(plans[name].build(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            assert n == warm_n
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
