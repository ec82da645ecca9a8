"""The reference battery as RUNNABLE SPARK SQL — the migration surface.

The reference's users write SQL (`analysis/flink-analysis.sql`); this
module gives them the same nine queries as `spark.sql(...)` strings
over a registered `events` view, so switching engines does not force a
rewrite into the DataFrame API. Each string is the Spark-dialect twin
of the corresponding `clickstream.py` DataFrame plan;
`tests/test_sql_twins.py` proves exact row-for-row equivalence, and
Catalyst compiles both to the same physical shapes (the 1-row
max-timestamp CTE still broadcasts — the optimizer sees through the
formulation, which is the point of declaring plans).

Usage:

    from kafka_flink_streaming_pipeline_spark.sources.batch import register_views
    from kafka_flink_streaming_pipeline_spark.plans.sql_twins import SPARK_SQL

    register_views(spark, sf_dir, "events")
    spark.sql(SPARK_SQL["q8_hourly_top20_24h"]).show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_GAP_US = 30 * 60 * 1_000_000

#: Spark-dialect twin of clickstream.ENRICHED_SQL (the DuckDB oracle
#: prefix): get_json_object for json_extract_string, STRING for VARCHAR.
ENRICHED_SPARK_SQL = """
WITH enriched AS (
  SELECT user_id                                               AS uuid,
         ts                                                    AS event_time,
         CAST(get_json_object(props, '$.k') AS BIGINT)         AS document_id,
         concat(upper(substring(event_type, 1, 2)), '>',
                CAST(user_id % 5 AS STRING), '>',
                CAST(CAST(get_json_object(props, '$.k') AS BIGINT) % 10
                     AS STRING))                               AS geo_location,
         user_id % 4                                           AS traffic_source,
         event_type
  FROM events
),
latest AS (SELECT max(event_time) AS max_ts FROM enriched)
"""

SPARK_SQL: dict[str, str] = {
    "q1_events_per_min": f"""{ENRICHED_SPARK_SQL}
SELECT date_format(date_trunc('minute', event_time), 'yyyy-MM-dd HH:mm:ss')
         AS minute_ts,
       count(*) AS events_per_min
FROM enriched, latest
WHERE event_time >= latest.max_ts - INTERVAL 1 HOUR
GROUP BY minute_ts
ORDER BY minute_ts
""",
    "q1_views_per_min": f"""{ENRICHED_SPARK_SQL}
SELECT date_format(date_trunc('minute', event_time), 'yyyy-MM-dd HH:mm:ss')
         AS minute_ts,
       count(*) AS page_views_per_min
FROM enriched, latest
WHERE event_time >= latest.max_ts - INTERVAL 1 HOUR
  AND event_type = 'view'
GROUP BY minute_ts
ORDER BY minute_ts
""",
    "q2_top_docs_6h": f"""{ENRICHED_SPARK_SQL}
SELECT e.document_id, count(*) AS impressions
FROM enriched e, latest
WHERE e.event_time >= latest.max_ts - INTERVAL 6 HOURS
GROUP BY e.document_id
ORDER BY impressions DESC, e.document_id ASC
LIMIT 10
""",
    "q3_geo_pv_24h": f"""{ENRICHED_SPARK_SQL}
SELECT split_part(p.geo_location, '>', 1) AS country,
       split_part(p.geo_location, '>', 2) AS state,
       split_part(p.geo_location, '>', 3) AS dma,
       count(*) AS pv
FROM enriched p, latest
WHERE p.event_type = 'view'
  AND p.event_time >= latest.max_ts - INTERVAL 24 HOURS
GROUP BY country, state, dma
ORDER BY pv DESC, country, state, dma
""",
    "q4_traffic_source_24h": f"""{ENRICHED_SPARK_SQL}
SELECT CASE p.traffic_source
         WHEN 1 THEN 'Desktop'
         WHEN 2 THEN 'Mobile'
         WHEN 3 THEN 'Tablet'
         ELSE 'Other'
       END AS traffic_source_label,
       count(*) AS clicks
FROM enriched p, latest
WHERE p.event_type = 'view'
  AND p.event_time >= latest.max_ts - INTERVAL 24 HOURS
GROUP BY traffic_source_label
ORDER BY clicks DESC, traffic_source_label
""",
    "q5_session_stats_12h": f"""{ENRICHED_SPARK_SQL},
ordered AS (
  SELECT uuid, event_time,
         lag(event_time) OVER (PARTITION BY uuid ORDER BY event_time) AS prev_time
  FROM enriched p, latest
  WHERE p.event_type = 'view'
    AND p.event_time >= latest.max_ts - INTERVAL 12 HOURS
),
session_marks AS (
  SELECT uuid, event_time,
         CASE WHEN prev_time IS NULL
                OR unix_micros(event_time) - unix_micros(prev_time) > {_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
session_ids AS (
  SELECT uuid, event_time,
         sum(new_session) OVER (PARTITION BY uuid ORDER BY event_time) AS session_id
  FROM session_marks
)
SELECT count(*) AS sessions_12h,
       (floor((CAST(sum(events_per_session) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0)
         AS avg_pages_per_session
FROM (
  SELECT uuid, session_id, count(*) AS events_per_session
  FROM session_ids
  GROUP BY uuid, session_id
) t
""",
    "q5a_session_marks_12h": f"""{ENRICHED_SPARK_SQL},
ordered AS (
  SELECT uuid, event_time,
         lag(event_time) OVER (PARTITION BY uuid ORDER BY event_time) AS prev_time
  FROM enriched p, latest
  WHERE p.event_type = 'view'
    AND p.event_time >= latest.max_ts - INTERVAL 12 HOURS
)
SELECT uuid,
       date_format(event_time, 'yyyy-MM-dd HH:mm:ss') AS event_time,
       CASE WHEN prev_time IS NULL
              OR unix_micros(event_time) - unix_micros(prev_time) > {_GAP_US}
            THEN 1 ELSE 0 END AS new_session
FROM ordered
ORDER BY uuid, event_time
""",
    "q6_avg_delay_5m": f"""{ENRICHED_SPARK_SQL}
SELECT (floor((CAST(sum(delay_us) AS DOUBLE) / count(*) / 1000.0) * 1.0 + 0.5) / 1.0) AS avg_ms_delay
FROM (
  SELECT unix_micros(latest.max_ts) - unix_micros(event_time) AS delay_us
  FROM enriched, latest
  WHERE event_time >= latest.max_ts - INTERVAL 5 MINUTES
) d
""",
    "q7_heatmap_7d": f"""{ENRICHED_SPARK_SQL}
SELECT date_format(event_time, 'HH') AS hour,
       date_format(event_time, 'E') AS weekday,
       count(*) AS pv
FROM enriched p, latest
WHERE p.event_type = 'view'
  AND p.event_time >= latest.max_ts - INTERVAL 7 DAYS
GROUP BY hour, weekday
""",
    "q8_hourly_top20_24h": f"""{ENRICHED_SPARK_SQL},
hourly AS (
  SELECT document_id,
         date_format(date_trunc('hour', event_time), 'yyyy-MM-dd HH:mm:ss')
           AS hour_bucket,
         count(*) AS pv
  FROM enriched p, latest
  WHERE p.event_type = 'view'
    AND p.event_time >= latest.max_ts - INTERVAL 24 HOURS
  GROUP BY hour_bucket, document_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY hour_bucket
                               ORDER BY pv DESC, document_id ASC) AS rn
  FROM hourly
)
SELECT hour_bucket, document_id, pv
FROM ranked
WHERE rn <= 20
ORDER BY hour_bucket, pv DESC, document_id
""",
    "q9_retention_d7": f"""{ENRICHED_SPARK_SQL},
first_seen AS (
  SELECT uuid, min(event_time) AS first_time
  FROM enriched
  GROUP BY uuid
),
day_n AS (
  SELECT e.uuid,
         CAST((unix_micros(e.event_time) - unix_micros(f.first_time))
              DIV 86400000000 AS INT) AS day_delta
  FROM enriched e
  JOIN first_seen f USING (uuid)
  WHERE e.event_time < f.first_time + INTERVAL 8 DAYS
)
SELECT day_delta, count(DISTINCT uuid) AS returning_users
FROM day_n
GROUP BY day_delta
ORDER BY day_delta
""",
}


def run_sql_twin(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Register the events view and run one SQL twin."""
    from kafka_flink_streaming_pipeline_spark.sources.batch import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(SPARK_SQL[name])
