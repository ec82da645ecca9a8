"""Derive an N-times larger copy of a driver testdata directory for
SCALING measurements (correctness stays pinned to the driver's own
sf dirs — this tool only exists so bench can be pointed at 10x/100x
data and the growth curve observed).

Facts are replicated with consistent key offsets (copy i shifts every
join/identity key by i * OFFSET), so FK relationships hold and per-key
cardinalities grow the way real traffic growth grows them. Dimension
tables (region, nation) are copied once — scaling grows facts, not
geography. Output is written as multi-file parquet (32 files/table),
so scans parallelize the way a real large table's splits do.

    python tools/scale_up_testdata.py --src /root/testdata/sf0.1 \
        --out /tmp/sf1 --factor 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OFFSET = 1_000_000_000

#: key columns shifted per copy, by table
KEYED = {
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", required=True)
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--files", type=int, default=32)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    spark = get_spark("scale-up")
    spark.sparkContext.setLogLevel("ERROR")

    for t in DIMS:
        load_table(spark, args.src, t).coalesce(1).write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        base = load_table(spark, args.src, t)
        copies = F.broadcast(
            spark.range(args.factor).select(F.col("id").alias("__copy"))
        )
        df = base.crossJoin(copies)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__copy") * OFFSET)
        (
            df.drop("__copy")
            .repartition(args.files)
            .write.mode("overwrite")
            .parquet(f"{args.out}/{t}.parquet")
        )
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows x{args.factor}")


if __name__ == "__main__":
    main()
