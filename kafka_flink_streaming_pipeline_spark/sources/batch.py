"""Batch sources — partitioned-parquet scans (reference S8-S10).

The reference reads partitioned parquet through a hand-rolled pyarrow
loop that resolves `platform=<id>/event_date=<date>` paths itself
(`kafka_stream_producer.py:242-259`). In Spark that entire mechanism is
one declarative scan: partition discovery + partition pruning + column
pruning + predicate pushdown all happen in the parquet source, visible
as `PushedFilters`/`partitionFilters` in `.explain`. Nothing to build —
just never circumvent it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every timestamp-ish column to session-UTC TIMESTAMP (LTZ).

    The driver testdata has shipped two parquet encodings across rounds:
    TIMESTAMP(NANOS) (read as LongType nanos under the legacy conf) and
    plain `timestamp[us]` without timezone (read as TIMESTAMP_NTZ by
    Spark 4). Both are normalized here to TIMESTAMP so downstream
    `unix_micros()` / interval arithmetic sees one type. Under the
    pinned UTC session the NTZ→LTZ cast is value-preserving, and DuckDB
    reads the same files as naive-UTC TIMESTAMP — so oracle comparisons
    stay bit-equal either way.
    """
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif f.name == "ts" and isinstance(f.dataType, T.LongType):
            # legacy nanos-as-long encoding, truncated to micros
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver testdata table (single parquet file per table).

    Timestamp columns are normalized to session-UTC TIMESTAMP via
    `normalize_timestamps` — see its docstring for the encodings the
    driver testdata has shipped.

    The testdata files are single-row-group, so each scan is one input
    split. That is fine for scan-light plans (the shuffle after the
    first partial agg restores parallelism); operators whose cost is
    dominated by per-row CPU (tokenize + hash in dedup/text) repartition
    explicitly at their input — see `operators.dedup._docs_parallel`.
    A real 100 TB table arrives as many splits and needs neither.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin timestamp semantics even under a session we didn't build
    # (the grading driver constructs its own plain SparkSession)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load_table` + scan-parallelism restoration for plans whose cost
    is per-row CPU ABOVE the scan (decimal arithmetic batteries, heavy
    aggregates): when the scan yields fewer input splits than half the
    session's parallelism — the single-row-group testdata layout, where
    the whole map side otherwise runs on one core — round-robin
    repartition to defaultParallelism. This is `_docs_parallel`'s
    documented policy (operators/dedup.py) generalized to the fact
    tables; the partition-count probe makes it scale-adaptive: a real
    many-split table takes the no-shuffle branch (r13, guide §2.5
    input-skew remedy / §1.2 distributed-algorithm-first).

    The probe (`df.rdd.getNumPartitions()` — forces physical planning
    plus a DataFrame→RDD conversion) runs ONCE per (sf_dir, table,
    parallelism) and the branch decision is memoized for the session
    (r14, ADVICE r13): split count is a pure function of the file
    layout and the scan confs, both fixed within a session, so repeat
    builds of the same plan skip the double planning entirely."""
    df = load_table(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    key = (sf_dir, name, par)
    few = _PARALLEL_PROBE_CACHE.get(key)
    if few is None:
        few = df.rdd.getNumPartitions() < max(2, par // 2)
        _PARALLEL_PROBE_CACHE[key] = few
    return df.repartition(par) if few else df


#: memoized `load_table_parallel` branch decisions — see its docstring
_PARALLEL_PROBE_CACHE: dict[tuple[str, str, int], bool] = {}


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    where: str | None = None,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: str | None = None,
    upper_bound: str | None = None,
) -> DataFrame:
    """S6: JDBC batch source (feature_batch_update.py:35-82 analogue).

    The reference's Flink JDBC source scans the whole Postgres table and
    filters afterwards (SURVEY.md §4 notes the day filter is NOT pushed
    down). Here the filter is pushed into the database by wrapping it in
    the dbtable subquery, and the scan parallelizes over
    `partition_column` ranges — both essential once the table stops
    fitting in one executor. Needs a reachable database; code path only
    in this container."""
    reader = spark.read.format("jdbc").option("url", url)
    dbtable = f"(SELECT * FROM {table} WHERE {where}) AS t" if where else table
    reader = reader.option("dbtable", dbtable)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for spark.sql() plans."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: "StructType | str | None" = None,
    mode: str = "PERMISSIVE",
):
    """JSON-Lines corpus reader — the interchange format LLM training
    corpora actually ship in (one JSON document per line, usually
    .jsonl or .jsonl.gz; Spark's json source decompresses by file
    extension automatically).

    An explicit schema is strongly preferred at scale: schema
    inference is a FULL extra pass over 100 TB before the real read.
    Malformed lines follow Spark's standard contract — PERMISSIVE
    keeps the row with parse-failed columns NULL and the raw line in
    `_corrupt_record` (declared in the schema here, so bad lines are
    quarantinable downstream instead of killing the job); DROPMALFORMED
    and FAILFAST are passed through for pipelines that prefer dropping
    or dying. Multiline JSON is deliberately NOT enabled: line-split
    files are what make the format splittable — one 100 GB .jsonl
    still parallelizes by HDFS/object-store block.
    """
    reader = spark.read.option("mode", mode).option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if mode.upper() == "PERMISSIVE" and "_corrupt_record" not in schema.names:
            # StructType.add mutates in place; copy first so the
            # caller's schema object doesn't silently grow a column
            schema = T.StructType(list(schema.fields)).add(
                "_corrupt_record", T.StringType()
            )
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl_corpus(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSON-Lines corpus writer (one document per line, gzip by
    default — the hand-off format for tokenizer/training jobs that
    don't read parquet). Column order follows the frame's schema;
    writers that need a stable multi-file layout should repartition by
    their shard key first."""
    df.write.mode("overwrite").option("compression", compression).json(path)
