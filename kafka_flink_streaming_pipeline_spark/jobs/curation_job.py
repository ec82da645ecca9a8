"""Curation batch job — run the composed training-data pipeline
(operators/curation.py: exact dedup → quality scoring → threshold
filter) over a corpus directory and write the curated table.

    python -m kafka_flink_streaming_pipeline_spark.jobs.curation_job \
        --sf-dir /root/testdata/sf0.001 --out /tmp/curated \
        [--min-quality 0.25] [--partitions 8]

At scale the output is written partitioned by a fingerprint prefix so
downstream near-dup passes (MinHash-LSH over the survivors) prune by
partition; locally the same layout is produced on the testdata corpus.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="training-data curation run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--min-quality", type=float, default=None)
    p.add_argument("--partitions", type=int, default=8)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.operators import curation

    spark = get_spark("kfsp-curation")
    spark.sparkContext.setLogLevel("ERROR")
    df = curation.curation_pipeline(spark, args.sf_dir)
    if args.min_quality is not None:
        df = df.filter(F.col("quality_score") >= args.min_quality)
    out = df.withColumn("fp_prefix", F.substring("fingerprint", 1, 1))
    (
        out.repartition(args.partitions, "fp_prefix")
        .write.mode("overwrite")
        .partitionBy("fp_prefix")
        .parquet(args.out)
    )
    kept = spark.read.parquet(args.out).count()
    total = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    print(f"curated {kept}/{total} docs -> {args.out}")


if __name__ == "__main__":
    main()
