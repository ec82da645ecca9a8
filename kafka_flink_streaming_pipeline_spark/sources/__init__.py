from kafka_flink_streaming_pipeline_spark.sources.batch import load_table, load_tables

__all__ = ["load_table", "load_tables"]
