"""Witness `corpus_chunk_windows`' slice-width independence at
REALISTIC document lengths (r5 verdict stretch #7).

The driver testdata docs are 27-72 words, so the per-round bench only
proves the chunker on trivially short docs. This experiment generates a
synthetic long-doc corpus (default 20k docs x 10k words — 200M words,
~800x the word mass of sf0.1's documents table) entirely INSIDE Spark
(array-transform of a sequence; no Python row loop), writes it as
multi-file parquet, and times the exact registered chunker over it with
the bench harness's materialization discipline (every output column
through xxhash64, so nothing is column-pruned away).

The claim under test: chunking cost is linear in TOTAL WORDS — per doc
it is n/stride slices of `chunk` words each (~1.5n word copies at the
registered chunk=24/stride=16), with no term that grows with doc length
beyond the word count itself, and no shuffle anywhere in the plan. A
quadratic re-tokenize (split() inlined into the per-chunk lambda — the
bug the operator's docstring warns about) would blow up ~600x at these
lengths and cannot hide.

Run:  python tools/longdoc_chunk_bench.py [--docs 20000] [--words 10000]
Prints one JSON line with corpus stats, wall seconds, and words/sec.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=20_000)
    p.add_argument("--words", type=int, default=10_000)
    p.add_argument("--out", default="/tmp/longdocs")
    p.add_argument("--files", type=int, default=32)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.operators.packing import (
        corpus_chunk_windows,
    )

    spark = get_spark("kfsp-longdoc-chunk")
    spark.sparkContext.setLogLevel("ERROR")

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)

    # deterministic synthetic text: word i of doc d is vocab index
    # (d*131 + i*7) % 5000 rendered as 'w<k>' — generated JVM-side so
    # corpus construction parallelizes like any other Spark job
    words = F.transform(
        F.sequence(F.lit(1), F.lit(args.words)),
        lambda i: F.concat(
            F.lit("w"), ((F.col("doc_id") * 131 + i * 7) % 5000).cast("string")
        ),
    )
    (
        spark.range(args.docs)
        .withColumnRenamed("id", "doc_id")
        .repartition(args.files)
        .select("doc_id", F.array_join(words, " ").alias("text"))
        .write.mode("overwrite")
        .parquet(str(out / "documents.parquet"))
    )

    # steady-state measurement, bench.py discipline: run once to absorb
    # codegen, clear data caches, time the re-built second run with
    # every output column forced through xxhash64
    def run() -> int:
        df = corpus_chunk_windows(spark, str(out))
        agg = df.select(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in df.columns)
                + "))"
            ).alias("h"),
        )
        return agg.collect()[0]["n"]

    run()
    spark.catalog.clearCache()
    t0 = time.time()
    n_chunks = run()
    dt = time.time() - t0

    total_words = args.docs * args.words
    print(
        json.dumps(
            {
                "docs": args.docs,
                "words_per_doc": args.words,
                "total_words": total_words,
                "n_chunks": n_chunks,
                "sec": round(dt, 2),
                "words_per_sec": int(total_words / dt),
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
