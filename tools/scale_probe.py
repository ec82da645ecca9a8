"""Focused scaling probe: time named registry entries at an arbitrary
(usually scaled-up) sf_dir with bench.py's exact measurement
discipline — run once to absorb codegen/Python-worker spin-up, drop
data caches, time the second fully re-materialized run with every
output column forced through xxhash64 (so Catalyst cannot prune the
work being measured).

bench.py measures the whole battery at $SPARK_GRAFT_SF_DIR; this tool
exists for the per-round PERF.md scaling cells, where only a handful of
entries need a 10x/100x point and running all ~120 would waste an hour.

Session-shared subtrees (pair graphs, PQ codes) are built by the warm-up
run, so the reported number is the steady-state marginal cost — the
same convention bench.py uses (it times the shared builds as separate
battery entries).

Run:  python tools/scale_probe.py /tmp/sf10 name [name ...]
Prints one JSON line per entry and a final summary line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, names = sys.argv[1], sys.argv[2:]

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.plans import merged

    spark = get_spark("kfsp-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    plans = merged()

    def materialize(build) -> tuple[int, float]:
        # bench.py's exact discipline: the timer starts BEFORE build()
        # so eager-at-build operators (localCheckpoint loops, persisted
        # index builds) are inside the measurement, and the expression
        # is bit_xor of xxhash64 over every column (never sum — summing
        # uniform 64-bit hashes overflows LONG under ANSI)
        t0 = time.time()
        df = build()
        row = df.select(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in df.columns)
                + "))"
            ).alias("h"),
        ).collect()[0]
        return row["n"], time.time() - t0

    out = {}
    for name in names:
        spec = plans.get(name)
        if spec is None:
            print(json.dumps({"name": name, "error": "not in registry"}))
            continue
        try:
            materialize(lambda: spec.build(spark, sf_dir))  # warm: codegen + shared subtrees
            spark.catalog.clearCache()
            n, dt = materialize(lambda: spec.build(spark, sf_dir))
            out[name] = round(dt, 2)
            print(json.dumps({"name": name, "rows": n, "sec": round(dt, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001 — probe reports, never dies
            print(json.dumps({"name": name, "error": f"{type(e).__name__}: {e}"[:300]}))
            out[name] = None
    print(json.dumps({"sf_dir": sf_dir, "sec_per_entry": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
