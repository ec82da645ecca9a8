"""Replay producer — the reference's Kafka stream producer re-expressed
(streaming/kafka_stream_producer.py: timestamp-ordered merge replay with
time_scale_factor pacing, SURVEY.md §3 honorable-mention entry point).

Reads a bounded events table, splits it into timestamp-contiguous
chunks, and drops them into a watch directory that `replay_stream`
consumes — optionally sleeping scaled inter-chunk deltas like the
reference producer (`time_scale_factor`, kafka_config.yml:43). With a
real broker, swap the file drop for `sinks.write_kafka` of the
`kafka_wire_frame` projection; the pacing loop is identical.

    python -m kafka_flink_streaming_pipeline_spark.jobs.replay_producer \
        --sf-dir /root/testdata/sf0.001 --out /tmp/replay --chunks 10 \
        --time-scale 0.0
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import time

from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser(description="timestamp-ordered replay producer")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="watch directory for replay_stream")
    p.add_argument("--chunks", type=int, default=10)
    p.add_argument(
        "--time-scale",
        type=float,
        default=0.0,
        help="sleep scale x (chunk time-span); 0 = no pacing (correctness runs)",
    )
    args = p.parse_args()

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from kafka_flink_streaming_pipeline_spark.sources.streaming import (
        assign_time_chunks,
    )

    spark = get_spark("replay-producer")
    spark.sparkContext.setLogLevel("ERROR")

    # One shuffle writes every chunk (quantile time-slices, one file per
    # chunk dir) — no `ntile() OVER (ORDER BY ts)` single-task global
    # sort, which is exactly the driver-loop bottleneck the reference
    # producer has (kafka_stream_producer.py:324-435). The driver then
    # only paces file drops; per-chunk stats ride a tiny groupBy.
    events = load_table(spark, args.sf_dir, "events")
    chunked = assign_time_chunks(events, args.chunks)
    staging = args.out.rstrip("/") + "__staging"
    (
        chunked.repartition(args.chunks, "chunk")
        # (chunk, ts): satisfies the dynamic-partition writer's required
        # sort directly, so the intra-chunk ts order is guaranteed, not
        # an artifact of a stable in-memory re-sort
        .sortWithinPartitions("chunk", "ts")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(staging)
    )
    # per-chunk stats from the staging files themselves — already
    # partitioned by chunk, so this is a cheap partition-pruned scan
    # (recomputing from `chunked` would re-run the full events pass)
    stats = {
        r.chunk: (r.n, r.lo, r.hi)
        for r in spark.read.parquet(staging)
        .groupBy("chunk")
        .agg(F.count("*").alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    }
    os.makedirs(args.out, exist_ok=True)
    total = 0
    t_start = time.time()
    for i in range(1, args.chunks + 1):
        if i not in stats:  # quantile ties can leave a chunk empty
            continue
        parts = glob.glob(f"{staging}/chunk={i}/part-*.parquet")
        if len(parts) != 1:  # load-bearing: a split chunk would replay
            # partially; RuntimeError, not assert (stripped under -O)
            raise RuntimeError(f"chunk {i} not clustered to one file: {parts}")
        dst = f"{args.out}/chunk_{i:04d}.parquet"
        shutil.copy(parts[0], dst)
        n, lo, hi = stats[i]
        total += n
        if args.time_scale > 0:
            time.sleep((hi - lo).total_seconds() * args.time_scale)
        rate = total / max(time.time() - t_start, 1e-9)
        print(f"chunk {i}/{args.chunks}: {n} rows [{lo} .. {hi}] cum_rate={rate:.1f} msg/s")
    shutil.rmtree(staging, ignore_errors=True)
    print(f"replayed {total} rows in {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
