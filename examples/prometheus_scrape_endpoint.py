"""Prometheus parity example — serve the streaming job's metrics as a
text-exposition scrape endpoint.

The reference monitors its pipeline from the OUTSIDE: kafka-exporter →
Prometheus (`analysis/prometheus.yml:5-8`), with PromQL like

    sum(rate(kafka_topic_partition_current_offset[1m])) by (topic)
    sum(kafka_consumergroup_lag) by (consumergroup, topic)

Spark's Structured Streaming surfaces the same signals from the INSIDE
— per-micro-batch progress plus `df.observe` business metrics computed
on the executors — so the exporter reduces to formatting scalars the
`RateListener` already holds (no extra scans, no driver collect). The
PromQL translation table lives in `monitoring.prometheus_text`.

Run against the file-replay Kafka twin (no broker in this container):

    python examples/prometheus_scrape_endpoint.py [--port 9099]

then `curl localhost:9099/metrics` while the replay drains. With a
real Kafka source the exact same listener/exporter attach unchanged —
the scrape surface is a property of the StreamingQuery, not the source.
"""

from __future__ import annotations

import argparse
import http.server
import sys
import tempfile
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=9099)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--serve-seconds", type=float, default=10.0)
    args = ap.parse_args()

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from kafka_flink_streaming_pipeline_spark.sources.streaming import (
        prepare_replay_chunks,
        replay_stream,
    )
    from kafka_flink_streaming_pipeline_spark.streaming.monitoring import (
        RateListener,
        observe_ingest,
        prometheus_text,
    )

    spark = get_spark("kfsp-prom-example")
    spark.sparkContext.setLogLevel("ERROR")

    listener = RateListener()
    spark.streams.addListener(listener)

    class MetricsHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib handler API
            body = prometheus_text(listener).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep stdout clean for the demo
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", args.port), MetricsHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"scrape endpoint: http://127.0.0.1:{args.port}/metrics")

    with tempfile.TemporaryDirectory() as tmp:
        chunk_dir, ckpt = f"{tmp}/chunks", f"{tmp}/ckpt"
        prepare_replay_chunks(
            spark, load_table(spark, args.sf_dir, "events"), chunk_dir, n_chunks=6
        )
        stream = observe_ingest(replay_stream(spark, chunk_dir))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        q.awaitTermination(args.serve_seconds)
        q.stop()

    print("--- final scrape ---")
    print(prometheus_text(listener), end="")
    srv.shutdown()


if __name__ == "__main__":
    main()
