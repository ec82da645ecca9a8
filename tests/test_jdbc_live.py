"""LIVE JDBC coverage for S6 (batch source, pushdown subquery +
partitioned scan) and S3/S7 (keyed upsert sink) — the two surfaces
every prior round carried as "untested-live" because the container has
no network database.

The container DOES ship an embeddable JDBC database: Apache Derby is
in pyspark's own jars directory, so these tests execute the REAL Spark
JDBC code paths — `JDBCRelation` range-partitioned scans with a
pushed-down subquery, the parallel JDBC batch writer, and a
server-side ANSI `MERGE INTO` — against a real SQL engine, with zero
extra dependencies. The option surface stays the reference's
(`tests/test_connector_contract.py` pins the Postgres option strings);
only url/driver differ, and the MERGE statement `jdbc_merge_upsert`
emits is valid verbatim on PostgreSQL 15+ (reference target:
events_postgres_sink.sql upsert semantics, feature_batch_update.py
batch read).
"""

from __future__ import annotations

import pytest

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _seed(spark, url, table="feat"):
    df = spark.range(100).selectExpr(
        "id", "id % 7 AS grp", "cast(id * 1.5 as double) AS val"
    )
    df.write.mode("overwrite").jdbc(url, table, properties=DERBY_PROPS)
    return df


def test_jdbc_source_pushdown_partitioned_scan(spark, derby_url):
    """S6: the day-filter the reference does NOT push down (SURVEY §4)
    must reach the database as a dbtable subquery, and the scan must
    parallelize over partitionColumn ranges."""
    from kafka_flink_streaming_pipeline_spark.sources.batch import jdbc_table

    _seed(spark, derby_url)
    out = jdbc_table(
        spark,
        derby_url,
        "feat",
        where='"grp" = 3',
        properties=DERBY_PROPS,
        partition_column='"id"',
        num_partitions=4,
        lower_bound="0",
        upper_bound="100",
    )
    assert out.rdd.getNumPartitions() == 4  # ranged, not single-connection
    rows = {(r["id"], r["val"]) for r in out.collect()}
    assert rows == {(i, i * 1.5) for i in range(3, 100, 7)}
    # the filter is in the relation itself, not a post-scan Spark filter
    assert '"grp" = 3' in out._jdf.queryExecution().simpleString()


def test_jdbc_merge_upsert_latest_wins(spark, derby_url):
    """S3/S7: staging + server-side MERGE — overlapping keys update,
    new keys insert, within-batch duplicates collapse to the latest by
    order_col; re-running the same batch is a no-op (idempotent)."""
    from kafka_flink_streaming_pipeline_spark.sinks import jdbc_merge_upsert

    batch1 = spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 100), (3, 30.0, 100)], "k int, v double, ts int"
    )
    jdbc_merge_upsert(batch1, derby_url, "state", ["k"], DERBY_PROPS, order_col="ts")

    # batch 2: update k=2 (two versions — ts=300 must win), insert k=4
    batch2 = spark.createDataFrame(
        [(2, 21.0, 200), (2, 22.0, 300), (4, 40.0, 200)], "k int, v double, ts int"
    )
    jdbc_merge_upsert(batch2, derby_url, "state", ["k"], DERBY_PROPS, order_col="ts")

    def snapshot():
        return {
            (r["k"], r["v"], r["ts"])
            for r in spark.read.jdbc(
                derby_url, "state", properties=DERBY_PROPS
            ).collect()
        }

    expect = {(1, 10.0, 100), (2, 22.0, 300), (3, 30.0, 100), (4, 40.0, 200)}
    assert snapshot() == expect
    # redelivery of batch 2 (the reference sink's at-least-once case)
    jdbc_merge_upsert(batch2, derby_url, "state", ["k"], DERBY_PROPS, order_col="ts")
    assert snapshot() == expect


def test_jdbc_upsert_as_foreachbatch_sink(spark, derby_url):
    """S3: drive `jdbc_merge_upsert` exactly as the streaming job's
    foreachBatch would — a sequence of micro-batches with overlapping
    keys — and assert the final table equals the batch-computed
    latest-state (the streaming/batch parity the parquet-MERGE twin
    pins, now against a live DB)."""
    from kafka_flink_streaming_pipeline_spark.sinks import jdbc_merge_upsert

    rows = [(i % 5, float(i), i) for i in range(30)]
    # three micro-batches of 10
    for lo in range(0, 30, 10):
        b = spark.createDataFrame(rows[lo : lo + 10], "k int, v double, ts int")
        jdbc_merge_upsert(b, derby_url, "ustate", ["k"], DERBY_PROPS, order_col="ts")
    got = {
        (r["k"], r["v"], r["ts"])
        for r in spark.read.jdbc(derby_url, "ustate", properties=DERBY_PROPS).collect()
    }
    expect = {(i % 5, float(i), i) for i in range(25, 30)}  # last write per key
    assert got == expect
