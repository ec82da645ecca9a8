from kafka_flink_streaming_pipeline_spark.functions.core import (
    decode_traffic_source,
    event_time_from_offset,
    geo_part,
    redis_feature_key,
    synth_geo,
)

__all__ = [
    "decode_traffic_source",
    "event_time_from_offset",
    "geo_part",
    "redis_feature_key",
    "synth_geo",
]
