"""Banded interval join — click→view attribution within a time bound.

Flink has a native interval join; OSS Spark plans a raw
`a.ts BETWEEN b.ts AND b.ts + X` predicate as a broadcast-nested-loop
(or a full cartesian per key) — quadratic per user. The scale-safe
composition is time banding:

    bucket = floor(ts / bound); the left side duplicates into its own
    and the NEXT bucket; equi-join on (key, bucket); re-check the exact
    interval predicate.

Every candidate pair shares a bucket, every true pair is found (a
[t, t+bound] window spans at most two buckets), and the join is a
plain hash equi-join whose shuffle carries each row at most twice.
This is the same trick as MinHash banding, applied to time.

Semantics here (reference-flavored attribution): for each click, every
view by the same user with click.ts <= view.ts <= click.ts + 5 min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

_BOUND_US = 5 * 60 * 1_000_000
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def click_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uuid"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uuid"),
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("view_us"),
        (F.unix_micros("ts") / F.lit(_BOUND_US)).cast("long").alias("bucket"),
    )
    banded_clicks = clicks.select(
        "uuid",
        "click_id",
        "click_us",
        F.explode(
            F.array(
                (F.col("click_us") / F.lit(_BOUND_US)).cast("long"),
                (F.col("click_us") / F.lit(_BOUND_US)).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    return (
        banded_clicks.join(views, ["uuid", "bucket"])
        .filter(
            (F.col("view_us") >= F.col("click_us"))
            & (F.col("view_us") <= F.col("click_us") + _BOUND_US)
        )
        .select(
            "uuid",
            "click_id",
            "view_id",
            ((F.col("view_us") - F.col("click_us")) / 1000).cast("long").alias("lag_ms"),
        )
    )  # unsorted pairs; exact predicate re-checked after the band join


ATTRIBUTION_ORACLE = f"""
SELECT c.user_id AS uuid,
       c.event_id AS click_id,
       v.event_id AS view_id,
       (epoch_us(v.ts) - epoch_us(c.ts)) // 1000 AS lag_ms
FROM events c
JOIN events v
  ON v.user_id = c.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND epoch_us(v.ts) >= epoch_us(c.ts)
 AND epoch_us(v.ts) <= epoch_us(c.ts) + {_BOUND_US}
"""


QUERIES: dict[str, QuerySpec] = {
    "attrib_click_to_view_5m": QuerySpec(
        "attrib_click_to_view_5m",
        click_view_attribution,
        ATTRIBUTION_ORACLE,
        "banded interval join: views within 5 min after a click",
    ),
}
