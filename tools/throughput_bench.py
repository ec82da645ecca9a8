"""Concurrent-streams throughput benchmark — the TPC-H 'throughput
test' analogue to bench.py's sequential power run.

K worker threads share ONE SparkSession (one JVM, one executor pool —
the multi-tenant layout of a shared cluster) and each executes the
same query medley in a different rotation. Jobs from different
threads interleave in the scheduler; with the FAIR scheduler each
stream gets its own pool so a long scan in stream A does not starve
stream B's short aggregations (Spark's documented multi-session
pattern — `spark.scheduler.mode=FAIR` + per-thread
`spark.scheduler.pool`).

Reported: wall-clock of the whole throughput window, queries/hour
(the TPC-H Throughput@Size shape), per-stream wall, and the
sequential-sum vs concurrent-wall speedup (how much of the box the
single-stream run leaves idle — at local[32] with ~1-task stages at
sf0.1, concurrency recovers the idle cores; on a saturated 100 TB
cluster the same number trends toward 1.0 and the FAIR pools are
about latency isolation instead).

Run:  python tools/throughput_bench.py [streams] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# a medley spanning the engine's families: OLAP joins/aggs, window
# functions, text scoring, dedup, ANN — short enough that K rotations
# finish in minutes at sf0.1, wide enough that streams contend on
# different resources (scan, shuffle, window sort)
MEDLEY = [
    "tpch_q1_pricing_summary",
    "tpch_q5_regional_revenue",
    "tpch_q13_order_distribution",
    "q8_hourly_top20_24h",
    "rfm_customer_segments",
    "text_quality_scores",
    "dedup_exact",
    "sim_ann_ivf",
    "profile_orders_one_pass",
    "curation_ccnet_buckets",
]


def main() -> int:
    streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.plans import merged

    spark = get_spark(
        "kfsp-throughput", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    plans = merged()

    def materialize(df) -> None:
        df.select(
            F.count("*"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
            ),
        ).collect()

    # warm pass (untimed): codegen compile + parquet footer caches, so
    # the sequential reference and the concurrent window start from the
    # SAME warm state — timing the first execution would charge codegen
    # to the sequential side and flatter the speedup
    for name in MEDLEY:
        materialize(plans[name].build(spark, sf_dir))
    seq = {}
    for name in MEDLEY:
        t0 = time.time()
        materialize(plans[name].build(spark, sf_dir))
        seq[name] = round(time.time() - t0, 3)

    stream_wall: dict[int, float] = {}
    errors: list[str] = []

    def run_stream(i: int) -> None:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"stream{i}")
        t0 = time.time()
        try:
            # each stream runs the medley in a different rotation so
            # streams are never executing the same plan simultaneously
            for name in MEDLEY[i % len(MEDLEY):] + MEDLEY[: i % len(MEDLEY)]:
                materialize(plans[name].build(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, don't deadlock join()
            errors.append(f"stream{i}: {type(e).__name__}: {e}"[:200])
        finally:
            stream_wall[i] = round(time.time() - t0, 3)
            sc.setLocalProperty("spark.scheduler.pool", None)

    t0 = time.time()
    threads = [
        threading.Thread(target=run_stream, args=(i,), daemon=True)
        for i in range(streams)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = round(time.time() - t0, 3)

    total_queries = streams * len(MEDLEY)
    seq_sum = round(sum(seq.values()), 3)
    print(
        json.dumps(
            {
                "metric": "throughput_streams_wall_clock",
                "value": wall,
                "unit": "sec",
                "streams": streams,
                "queries_total": total_queries,
                "queries_per_hour": round(total_queries * 3600 / wall, 1),
                "seq_sum_one_stream": seq_sum,
                "concurrency_speedup_vs_sequential": round(
                    seq_sum * streams / wall, 2
                ),
                "per_stream_wall": stream_wall,
                "errors": errors,
                "sf_dir": sf_dir,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
