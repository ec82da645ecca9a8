"""Declared schemas — the engine's fixed/declared schema system.

The reference declares an explicit schema at every boundary (Flink DDL
`events_postgres_sink.sql:14-23`, Postgres DDL `01_init_tables.sql`,
producer column lists `kafka_stream_producer.py:149-163`). We mirror
that: every source is read with a declared StructType; JSON on the wire
is decoded with `from_json(col, schema)` — schema-on-read with a fixed
schema, exactly like Flink's `'format'='json'` tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference (Outbrain) data model — SURVEY.md §1.2 ---------------------

#: `events` — flink-jobs/events_postgres_sink.sql:14-23
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("display_id", T.LongType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("document_id", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("geo_location", T.StringType()),
        T.StructField("platform_id", T.IntegerType()),
        T.StructField("act_prod_time", T.TimestampType()),
    ]
)

#: `page_views` — flink-jobs/page_views_postgres_sink.sql:14-23
PAGE_VIEWS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType()),
        T.StructField("document_id", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("geo_location", T.StringType()),
        T.StructField("traffic_source", T.IntegerType()),
        T.StructField("platform_id", T.IntegerType()),
        T.StructField("act_prod_time", T.TimestampType()),
    ]
)

#: `features_20m` — postgres/init-scripts/01_init_tables.sql:30-36
FEATURES_20M_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), nullable=False),
        T.StructField("window_end", T.TimestampType(), nullable=False),
        T.StructField("click20m", T.LongType()),
        T.StructField("view20m", T.LongType()),
    ]
)

#: Redis feature-store row — flink-jobs/redis_sink copy.sql:45-57
FEATURE_KV_SCHEMA = T.StructType(
    [
        T.StructField("redis_key", T.StringType(), nullable=False),
        T.StructField("redis_hash", T.MapType(T.StringType(), T.StringType())),
    ]
)

# --- Driver testdata model (/root/testdata/sf*) ---------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
